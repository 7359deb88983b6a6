"""Replay protection for foreachBatch incremental-state streams.

Spark's foreachBatch contract is at-least-once: a batch that fails
after its side effect but before the checkpoint commit is retried with
the SAME batch_id. Folds that are not idempotent (Misra–Gries merges)
must therefore record the last applied id and skip replays. Batch ids
are monotone per checkpoint, so "applied" is a single max — stored as
a JSON marker beside the state, written atomically (tmp + rename).

The marker is paired with the stream's checkpoint: reusing a state
directory with a FRESH checkpoint restarts ids at 0, so state and
checkpoint must live and die together (same rule Spark applies to its
own sinks).
"""

from __future__ import annotations

import json
import os

_MARKER = "_applied_batch.json"


def _marker_path(state_path: str) -> str:
    return state_path.rstrip("/") + "." + _MARKER


def already_applied(state_path: str, batch_id: int) -> bool:
    p = _marker_path(state_path)
    if not os.path.exists(p):
        return False
    with open(p) as fh:
        return batch_id <= json.load(fh)["max_batch_id"]


def mark_applied(state_path: str, batch_id: int) -> None:
    p = _marker_path(state_path)
    tmp = p + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"max_batch_id": batch_id}, fh)
    os.replace(tmp, p)
