"""Experiment loggers: TensorBoard (dependency-free) + Weights & Biases.

Parity target: the reference's three optional PyTorch-Lightning loggers —
W&B / CSV / TensorBoard (`/root/reference/bcos/training/trainer.py:935-971`,
selected by ``--wandb_logger/--csv_logger/--tensorboard_logger`` in
`train.py:68-81`). CSV + metrics.json.gz live in ``Trainer._log_metrics``;
this module adds the event-stream backends:

- ``TensorBoardLogger`` writes standard ``events.out.tfevents.*`` files with
  a self-contained protobuf/TFRecord encoder (scalars + PNG image summaries)
  — no tensorflow/tensorboardX dependency, readable by any TensorBoard.
- ``WandbLogger`` is import-gated: a hard dependency in the reference, here it
  degrades to a no-op with a warning when ``wandb`` isn't installed. Run-id
  reuse for requeued jobs mirrors `trainer.py:941-948`.
"""
from __future__ import annotations

import io
import os
import socket
import struct
import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

__all__ = ["TensorBoardLogger", "WandbLogger", "setup_loggers"]


# -- CRC32C (Castagnoli, reflected poly 0x82F63B78) — TFRecord framing ---------
_CRC_TABLE = []


def _crc_table():
    global _CRC_TABLE
    if not _CRC_TABLE:
        table = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ (0x82F63B78 if c & 1 else 0)
            table.append(c)
        _CRC_TABLE = table
    return _CRC_TABLE


def _crc32c(data: bytes) -> int:
    table = _crc_table()
    crc = 0xFFFFFFFF
    for byte in data:
        crc = table[(crc ^ byte) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# -- minimal protobuf wire encoding -------------------------------------------
def _varint(value: int) -> bytes:
    # negative >>7 never reaches 0 in Python (sign-extending shift): an
    # accidental -1 step would loop forever growing the buffer — fail loudly
    if value < 0:
        raise ValueError(f"varint requires a non-negative value, got {value}")
    out = bytearray()
    while True:
        bits = value & 0x7F
        value >>= 7
        if value:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def _field_varint(num: int, value: int) -> bytes:
    return _varint(num << 3) + _varint(value)


def _field_bytes(num: int, data: bytes) -> bytes:
    return _varint((num << 3) | 2) + _varint(len(data)) + data


def _field_double(num: int, value: float) -> bytes:
    return _varint((num << 3) | 1) + struct.pack("<d", value)


def _field_float(num: int, value: float) -> bytes:
    return _varint((num << 3) | 5) + struct.pack("<f", value)


def _summary_value_scalar(tag: str, value: float) -> bytes:
    # Summary.Value { tag = 1; simple_value = 2 }
    return _field_bytes(1, tag.encode()) + _field_float(2, value)


def _summary_value_image(tag: str, png: bytes, h: int, w: int, channels: int) -> bytes:
    # Summary.Image { height=1; width=2; colorspace=3; encoded_image_string=4 }
    img = (
        _field_varint(1, h)
        + _field_varint(2, w)
        + _field_varint(3, channels)
        + _field_bytes(4, png)
    )
    # Summary.Value { tag = 1; image = 4 }
    return _field_bytes(1, tag.encode()) + _field_bytes(4, img)


def _event(step: Optional[int] = None, summary_values: Optional[List[bytes]] = None,
           file_version: Optional[str] = None) -> bytes:
    # Event { wall_time=1 (double); step=2; file_version=3; summary=5 }
    ev = _field_double(1, time.time())
    if step is not None:
        ev += _field_varint(2, int(step))
    if file_version is not None:
        ev += _field_bytes(3, file_version.encode())
    if summary_values:
        summary = b"".join(_field_bytes(1, v) for v in summary_values)
        ev += _field_bytes(5, summary)
    return ev


class TensorBoardLogger:
    """Standard-format tfevents writer (scalars + images), pure Python."""

    def __init__(self, logdir):
        self.logdir = Path(logdir)
        self.logdir.mkdir(parents=True, exist_ok=True)
        fname = f"events.out.tfevents.{int(time.time())}.{socket.gethostname()}.{os.getpid()}"
        self._f = open(self.logdir / fname, "ab")
        self._write_record(_event(file_version="brain.Event:2"))

    def _write_record(self, data: bytes):
        header = struct.pack("<Q", len(data))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(data)
        self._f.write(struct.pack("<I", _masked_crc(data)))
        self._f.flush()

    def log_metrics(self, metrics: Dict[str, float], step: int):
        values = [
            _summary_value_scalar(k, float(v))
            for k, v in metrics.items()
            if np.isfinite(v)
        ]
        if values:
            self._write_record(_event(step=step, summary_values=values))

    def log_image(self, tag: str, image: np.ndarray, step: int):
        """image: [H, W, C] uint8 (C in {1, 3, 4}) or float in [0, 1]."""
        from PIL import Image

        arr = np.asarray(image)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
        mode = {1: "L", 3: "RGB", 4: "RGBA"}[arr.shape[-1]]
        if arr.shape[-1] == 1:
            arr = arr[..., 0]
        buf = io.BytesIO()
        Image.fromarray(arr, mode).save(buf, format="PNG")
        h, w = arr.shape[:2]
        c = image.shape[-1]
        self._write_record(
            _event(step=step, summary_values=[
                _summary_value_image(tag, buf.getvalue(), h, w, c)
            ])
        )

    def log_hparams(self, config: Dict):
        # a one-off text-free scalar-less event stream would be pointless;
        # persist alongside the events instead (plain JSON, like the CSV logger)
        import json

        try:
            from bcosification_tpu.experiments.utils.config_utils import (
                sanitize_config,
            )

            config = sanitize_config(config)
        except Exception:
            config = {k: repr(v) for k, v in config.items()}
        (self.logdir / "hparams.json").write_text(json.dumps(config, default=repr))

    def finalize(self):
        # flush only: a Trainer may run fit() more than once (resume patterns)
        # and keeps its loggers across runs; the file closes with the process
        self._f.flush()


class WandbLogger:
    """W&B metrics/images logger; no-op when wandb is unavailable.

    Mirrors the reference's run-id handling for SLURM requeues
    (`trainer.py:941-948`, `run_with_submitit.py:100-105`): pass a stable
    ``run_id`` so a resumed job continues the same W&B run.
    """

    def __init__(self, save_dir, project: Optional[str] = None,
                 run_id: Optional[str] = None, config: Optional[Dict] = None,
                 name: Optional[str] = None):
        self._atexit_registered = False
        try:
            import wandb
        except ImportError:
            print("wandb not installed — WandbLogger is a no-op")
            self._run = None
            return
        from bcosification_tpu.experiments.utils.config_utils import sanitize_config

        self._run = wandb.init(
            project=project or os.getenv("WANDB_PROJECT", "bcosification_tpu"),
            id=run_id,
            resume="allow" if run_id else None,
            dir=str(save_dir),
            name=name,
            config=sanitize_config(config) if config else None,
        )

    def log_metrics(self, metrics: Dict[str, float], step: int):
        if self._run is not None:
            self._run.log(dict(metrics), step=step)

    def log_image(self, tag: str, image: np.ndarray, step: int):
        if self._run is not None:
            import wandb

            self._run.log({tag: wandb.Image(np.asarray(image))}, step=step)

    def log_hparams(self, config: Dict):
        if self._run is not None:
            from bcosification_tpu.experiments.utils.config_utils import (
                sanitize_config,
            )

            self._run.config.update(sanitize_config(config), allow_val_change=True)

    def finalize(self):
        # A Trainer keeps its loggers across fit() calls (resume patterns —
        # see TensorBoardLogger.finalize), so do NOT finish the run here: a
        # finished wandb run rejects/drops all later logs. The run is closed
        # once, at interpreter exit.
        if self._run is not None and not self._atexit_registered:
            import atexit

            atexit.register(self._run.finish)
            self._atexit_registered = True


def setup_loggers(trainer_config: Dict, save_dir) -> List:
    """Build the optional event-stream loggers from trainer args.

    (CSV + metrics.json.gz are always written by ``Trainer._log_metrics`` —
    the reference's CSVLogger equivalent.)
    """
    loggers: List = []
    if trainer_config.get("tensorboard_logger"):
        loggers.append(TensorBoardLogger(Path(save_dir) / "tb"))
    if trainer_config.get("wandb_logger"):
        loggers.append(
            WandbLogger(
                save_dir,
                project=trainer_config.get("wandb_project"),
                run_id=trainer_config.get("wandb_id"),
                name=trainer_config.get("wandb_name"),
            )
        )
    return loggers
