"""Host-side data pipelines.

`synthetic` provides the hermetic defect-blob fixture used by tests and the
bench harness (SURVEY.md §4c); `pipeline` is the real-image pipeline with
the reference's split protocol; `specs` holds per-dataset parameters.
"""
from uaps_tpu.data.synthetic import SyntheticDefects, synthetic_batch

__all__ = ["SyntheticDefects", "synthetic_batch"]
