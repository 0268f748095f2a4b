"""eval CLI / evaluate() end-to-end on a trained synthetic checkpoint."""
import dataclasses

import numpy as np
import pytest

import jax


def test_evaluate_after_training(tmp_path):
    from uaps_tpu.train import Trainer
    from uaps_tpu.eval import evaluate
    from uaps_tpu.utils.config import preset

    cfg = preset("synthetic", method="uaps")
    cfg.data = dataclasses.replace(cfg.data, image_size=(32, 32),
                                   batch_size=4)
    cfg.run = dataclasses.replace(cfg.run, epochs=1, iter_per_epoch=2,
                                  out_dir=str(tmp_path))
    Trainer(cfg).run()

    viz = tmp_path / "viz"
    # pass the RUN dir — evaluate() must find its checkpoints/ subdir
    results = evaluate(cfg, str(tmp_path), split="test",
                       save_viz=str(viz))
    for k in ["miou", "mdice", "pixel_acc", "p50_latency_ms"]:
        assert np.isfinite(results[k]), k
    assert results["num_images"] > 0
    assert (viz / "000_pred.png").exists()
    assert (viz / "000_gt.png").exists()
    assert (viz / "000_uncert.png").exists()


def test_evaluate_missing_checkpoint_raises(tmp_path):
    from uaps_tpu.eval import evaluate
    from uaps_tpu.utils.config import preset
    cfg = preset("synthetic")
    with pytest.raises(FileNotFoundError):
        evaluate(cfg, str(tmp_path / "nope"))
