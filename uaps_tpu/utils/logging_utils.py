"""Structured logging: stdout logger + JSONL metrics + optional TensorBoard.

Replaces the reference's three duplicated channels (python logger,
tensorboardX scalars, print banners — SURVEY.md §5.5) with one metric dict
per step/epoch fanned out to all sinks. Metrics arrive as device arrays and
are converted once here (the reference syncs per loss term per iteration
via .item(), a throughput bug noted in SURVEY §3.1).
"""
from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Dict, Optional


def get_logger(log_dir: str, name: str = "uaps") -> logging.Logger:
    """stdout + <log_dir>/run.log, mirroring utilities/utilities.py:24-32."""
    os.makedirs(log_dir, exist_ok=True)
    logger = logging.getLogger(f"{name}:{log_dir}")
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        fh = logging.FileHandler(os.path.join(log_dir, "run.log"))
        fh.setFormatter(fmt)
        logger.addHandler(sh)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


class MetricWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(os.path.join(log_dir, "tbx_log"))
            except Exception:
                self._tb = None

    def write(self, step: int, metrics: Dict, prefix: str = ""):
        scalars = {}
        for k, v in metrics.items():
            try:
                scalars[f"{prefix}{k}"] = float(v)
            except (TypeError, ValueError):
                continue
        rec = {"step": step, "time": time.time(), **scalars}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, v, step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
