"""Serving export: package the fused predict program as a StableHLO blob.

A TPU-first serving path the reference never had (its deployment story was
"load the ``.pth`` inside another torch process" — ``lib/ssds.py:~15``,
SURVEY.md §2.2): :func:`export_detector` serializes the WHOLE fused predict
program — on-device mean subtraction, bf16 conv forward, box decode, NMS,
top-k — through ``jax.export`` into a versioned, self-contained StableHLO
artifact. A serving process needs only ``jax`` + ``flax.serialization``
(msgpack weights restore) and the files written here; none of the model
zoo, config system, or detector code runs at load time.

Files written to ``<dir>``:

``predict.shlo``
    serialized ``jax.export.Exported`` (StableHLO bytecode with
    compatibility-versioned custom calls).
``weights.msgpack``
    the variables pytree in the same flax msgpack format as training
    checkpoints (restored template-free via ``msgpack_restore``).
``export.json``
    model name, image size, class count, batch mode — so a server can
    sanity-check what it is loading.

The batch dimension is exported symbolically by default (one artifact
serves any batch size); pass ``batch=<int>`` for a fixed-shape artifact if
the consuming runtime predates shape polymorphism. By default the artifact
targets the platform it was exported on — pass e.g.
``platforms=("tpu", "cpu")`` to emit a multi-platform module.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization
from jax import export as jax_export

_BLOB = "predict.shlo"
_WEIGHTS = "weights.msgpack"
_META = "export.json"


def export_detector(det, out_dir: str, batch=None, platforms=None) -> str:
    """Export ``det``'s predict program + weights for serving.

    Args:
      det: a constructed :class:`ssds_tpu.detector.ObjectDetector`.
      out_dir: directory to create/fill.
      batch: ``None`` → symbolic batch dimension (any batch size at call
        time); an ``int`` → fixed-shape export.
      platforms: optional sequence of lowering platforms (e.g.
        ``("tpu", "cpu")``); default = the current backend only.

    Returns ``out_dir``.
    """
    h, w = det.img_hw
    if batch is None:
        (b,) = jax_export.symbolic_shape("b")
        img_shape = (b, h, w, 3)
    else:
        img_shape = (int(batch), h, w, 3)
    img_spec = jax.ShapeDtypeStruct(img_shape, jnp.uint8)
    var_specs = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)),
        det.variables)

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = jax_export.export(jax.jit(det._predict), **kwargs)(
        var_specs, img_spec)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _BLOB), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(out_dir, _WEIGHTS), "wb") as f:
        f.write(serialization.to_bytes(det.variables))
    meta = {
        "ssds": str(det.cfg.MODEL.SSDS),
        "nets": str(det.cfg.MODEL.NETS),
        "image_size": [h, w],
        "num_classes": int(det.cfg.POST_PROCESS.NUM_CLASSES),
        "batch": "symbolic" if batch is None else int(batch),
        "platforms": list(exported.platforms),
        "input": "uint8 BGR [B,H,W,3] at image_size (host resize only)",
        "output": "[B, num_classes, max_detections, 5] (score,x1,y1,x2,y2)",
    }
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


def load_exported(in_dir: str):
    """Load a served model: returns ``(predict, meta)``.

    ``predict(images_u8) -> [B, C, max_detections, 5]`` — images already
    resized to the exported ``image_size``, uint8 BGR. Weights live inside
    the returned closure; no ssds_tpu model code runs.
    """
    with open(os.path.join(in_dir, _BLOB), "rb") as f:
        exported = jax_export.deserialize(f.read())
    with open(os.path.join(in_dir, _WEIGHTS), "rb") as f:
        variables = serialization.msgpack_restore(f.read())
    with open(os.path.join(in_dir, _META)) as f:
        meta = json.load(f)

    def predict(images_u8):
        return exported.call(variables, jnp.asarray(images_u8, jnp.uint8))

    return predict, meta


def load_exported_sharded(in_dir: str, mesh):
    """Serve an exported artifact data-parallel over a device mesh.

    The batch dimension shards over the FIRST mesh axis; weights replicate.
    Per-image independence of the whole predict program (convs batch-wise,
    NMS per image) makes the sharded result bit-identical to single-device
    — XLA compiles one SPMD program and each chip runs its batch slice.
    Batch size must divide the axis size. Requires a symbolic-batch export
    (the default) unless the fixed batch already matches.

    Multi-chip serving the reference never had (its deployment story was a
    single-GPU torch process — ``lib/ssds.py:~15``): export once on any
    host, then e.g. ``load_exported_sharded(dir, Mesh(jax.devices(), ("data",)))``
    on a v5e pod slice serves batches across every chip with no model code.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    with open(os.path.join(in_dir, _BLOB), "rb") as f:
        exported = jax_export.deserialize(f.read())
    with open(os.path.join(in_dir, _WEIGHTS), "rb") as f:
        variables = serialization.msgpack_restore(f.read())
    with open(os.path.join(in_dir, _META)) as f:
        meta = json.load(f)

    axis = mesh.axis_names[0]
    replicated = NamedSharding(mesh, PartitionSpec())
    batch_sharded = NamedSharding(mesh, PartitionSpec(axis))
    variables = jax.device_put(variables, replicated)
    call = jax.jit(exported.call)

    def predict(images_u8):
        x = jax.device_put(jnp.asarray(images_u8, jnp.uint8), batch_sharded)
        return call(variables, x)

    return predict, meta
