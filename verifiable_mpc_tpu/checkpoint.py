"""Checkpointing: persist proofs, generators and SNARK keys to disk.

The reference keeps everything in memory (SURVEY.md §5.4); here any protocol
object graph that the canonical serializer understands (proof dicts,
generator dicts, eval/verification keys) can be written to and restored from
disk — enabling prover/verifier separation across machines and resumable
pipelines.
"""

from __future__ import annotations

import os

from . import serialization


def save(obj, path: str) -> None:
    data = serialization.dumps(obj)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(data)
    os.replace(tmp, path)


def load(path: str):
    with open(path, "rb") as fh:
        return serialization.loads(fh.read())
