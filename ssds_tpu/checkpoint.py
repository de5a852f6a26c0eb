"""Checkpoint save/restore with reference-compatible manifest + scope filters.

Behavioral spec source: reference ``lib/ssds_train.py:~60–110`` (SURVEY.md
§2.2): ``save_checkpoints`` writes ``{EXP_DIR}/{PREFIX}_epoch_{N}.pth`` and
appends to ``{EXP_DIR}/checkpoint_list.txt``; ``find_previous()`` parses that
manifest to auto-resume the newest checkpoint; ``resume_checkpoint`` loads
only keys present in both file and model (printing unresolved keys),
optionally restricted by a RESUME_SCOPE comma-separated prefix string —
the pretrained-backbone grafting mechanism.

Format: flax msgpack (``flax.serialization``) — a single ``.ckpt`` file per
epoch holding ``{'params', 'batch_stats', 'epoch'}``. A torch ``.pth``
importer for reference-trained weights lives in
:mod:`ssds_tpu.torch_import`.
"""

from __future__ import annotations

import os
import re
from typing import Optional, Tuple

import numpy as np
from flax import serialization, traverse_util


# Scope vocabulary: reference module names -> our flax top-level prefixes.
SCOPE_PREFIXES = {
    "base": ("base_layers",),
    "norm": ("norm",),
    "extras": ("extra_layers", "fusion_layers", "extras"),
    "transforms": ("transforms",),
    "pyramids": ("pyramid_layers",),
    "fusion": ("fusion_bn",),
    "loc": ("head.loc", "loc"),
    "conf": ("head.conf", "conf"),
}


def _name_matches(name: str, prefix: str) -> bool:
    """Module-name match: exact, '<prefix>_*' (list entries like
    base_layers_0 vs 'base'... handled via SCOPE_PREFIXES), or
    '<prefix><digits>' (loc0/conf2 style heads). A bare longer word
    ('conf_adapter' vs scope 'conf') does NOT match."""
    if name == prefix or name.startswith(prefix + "_"):
        return True
    tail = name[len(prefix):]
    return name.startswith(prefix) and tail.isdigit() and tail != ""


def path_in_scope(path: Tuple[str, ...], scope: str) -> bool:
    """Does a flattened variable path fall under a scope string
    (e.g. 'base,norm,extras')? Empty scope matches everything."""
    if not scope:
        return True
    joined = ".".join(str(p) for p in path)
    for word in (w.strip() for w in scope.split(",") if w.strip()):
        for prefix in SCOPE_PREFIXES.get(word, (word,)):
            if "." in prefix:
                if joined.startswith(prefix):
                    return True
            else:
                if _name_matches(str(path[0]), prefix):
                    return True
                # 'head.loc0' style: also check second level for loc/conf
                if len(path) > 1 and str(path[0]) == "head" and _name_matches(
                    str(path[1]), prefix
                ):
                    return True
    return False


def save_checkpoint(exp_dir: str, prefix: str, epoch: int, variables: dict) -> str:
    """Write ``{exp_dir}/{prefix}_epoch_{epoch}.ckpt`` + manifest line.

    Atomic: serialize to ``.tmp`` then rename, and append the manifest line
    only after the payload is durable — a preempted save never yields a
    manifest entry pointing at a torn file (``find_previous`` resumes from
    the previous intact checkpoint).
    """
    os.makedirs(exp_dir, exist_ok=True)
    variables = dict(variables)
    variables["epoch"] = epoch
    name = f"{prefix}_epoch_{epoch}.ckpt"
    path = os.path.join(exp_dir, name)
    data = serialization.to_bytes(variables)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    manifest = os.path.join(exp_dir, "checkpoint_list.txt")
    with open(manifest, "a") as f:
        f.write(f"epoch {epoch}:{name}\n")
    return path


class AsyncCheckpointer:
    """Non-blocking checkpoint writer: the device->host fetch happens on the
    caller thread (cheap, pipelined), serialization + disk IO on a worker —
    training never stalls on checkpoint writes. ``wait()`` joins the queue
    (called at end of training and before reading a just-saved file)."""

    def __init__(self):
        import queue
        import threading

        self._q = queue.Queue()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            exp_dir, prefix, epoch, variables = item
            try:
                save_checkpoint(exp_dir, prefix, epoch, variables)
            except Exception as e:  # pragma: no cover - best effort logging
                print(f"async checkpoint save failed: {e}")
            finally:
                self._q.task_done()

    def save(self, exp_dir: str, prefix: str, epoch: int, variables: dict) -> None:
        import jax

        host_vars = jax.device_get(variables)
        self._q.put((exp_dir, prefix, epoch, host_vars))

    def wait(self) -> None:
        self._q.join()


def find_previous(exp_dir: str):
    """Parse checkpoint_list.txt; return (epochs, paths) or False
    (reference ``find_previous``)."""
    manifest = os.path.join(exp_dir, "checkpoint_list.txt")
    if not os.path.exists(manifest):
        return False
    epochs, paths = [], []
    with open(manifest) as f:
        for line in f:
            m = re.match(r"epoch (\d+):(.*)", line.strip())
            if not m:
                continue
            path = os.path.join(exp_dir, m.group(2))
            if os.path.exists(path):
                epochs.append(int(m.group(1)))
                paths.append(path)
    if not epochs:
        return False
    return epochs, paths


def resume_checkpoint(variables: dict, path: str, resume_scope: str = "") -> dict:
    """Load a checkpoint into ``variables``, filtered like the reference:
    only keys present in BOTH (unresolved keys printed), restricted to
    RESUME_SCOPE prefixes when given. Returns new variables pytree."""
    with open(path, "rb") as f:
        data = f.read()
    # Deserialize against a compatible target: tolerate missing collections.
    raw = serialization.msgpack_restore(data)
    raw.pop("epoch", None)

    flat_model = traverse_util.flatten_dict(variables)
    flat_ckpt = traverse_util.flatten_dict(raw)

    loaded, skipped = 0, []
    out = dict(flat_model)
    for k, v in flat_ckpt.items():
        if k not in flat_model:
            skipped.append("/".join(map(str, k)))
            continue
        # scope filter applies to the variable path below the collection
        # name, e.g. ('params', 'base_layers_0', 'kernel') -> check [1:]
        if resume_scope and not path_in_scope(k[1:], resume_scope):
            continue
        if np.shape(flat_model[k]) != np.shape(v):
            skipped.append("/".join(map(str, k)) + " (shape)")
            continue
        out[k] = np.asarray(v, dtype=np.asarray(flat_model[k]).dtype)
        loaded += 1
    missing = [k for k in flat_model if k not in flat_ckpt]
    if skipped:
        print(f"resume: {len(skipped)} checkpoint keys unresolved: {skipped[:8]}...")
    if missing:
        print(f"resume: {len(missing)} model keys not in checkpoint (kept init)")
    print(f"resume: loaded {loaded}/{len(flat_model)} variables from {path}")
    result = traverse_util.unflatten_dict(out)
    # flatten_dict drops EMPTY collections (e.g. batch_stats={} for BN-less
    # models like ssd_vgg16), which would make the restored tree lose the
    # key entirely; preserve every top-level collection from the input.
    for coll, val in variables.items():
        if coll not in result:
            result[coll] = val
    return result


def checkpoint_epoch(path: str) -> Optional[int]:
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    e = raw.get("epoch")
    return int(e) if e is not None else None
