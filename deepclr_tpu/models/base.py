"""Inference helper: sequential / pairwise prediction with fixed shapes.

Port of the reference ModelInferenceHelper semantics
(/root/reference/deepclr/models/base.py:56-136): in sequential mode every
LiDAR frame is encoded exactly once; the previous frame's encoded features are
cached as state so each registration only runs the motion embedding + head.

TPU adaptation: clouds are padded / subsampled to a fixed ``num_points``
buffer (instead of random-cropping pairs to equal size) so the jitted encode /
register programs compile once and are reused for the whole sequence.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .deepclr import DeepCLR
from ..ops.morton import morton_argsort_np

__all__ = ["BatchedSequentialHelper", "ModelInferenceHelper", "pad_cloud"]


def pad_cloud(points: np.ndarray, num_points: int,
              rng: Optional[np.random.Generator] = None,
              morton: bool = False):
    """Pad (with zeros + mask) or subsample a cloud to exactly num_points.

    Returns (points (num_points, D) float32, mask (num_points,) bool).
    Subsampling is uniform-random like the reference's stack()
    (models/base.py:122-136).  ``morton=True`` Morton-sorts the valid
    points on the host (see data/batching.py pad_points).
    """
    n, d = points.shape
    if n > num_points:
        rng = rng or np.random.default_rng(0)
        sel = rng.choice(n, size=num_points, replace=False)
        points, n = points[sel], num_points
    if morton and n > 1:
        points = points[morton_argsort_np(points)]
    if n == num_points:
        return points.astype(np.float32), np.ones(num_points, bool)
    out = np.zeros((num_points, d), np.float32)
    out[:n] = points
    mask = np.zeros(num_points, bool)
    mask[:n] = True
    return out, mask


def _quantize_u16(pts: np.ndarray):
    """Per-cloud uint16 fixed-point quantization of a padded (P, D) cloud.

    Halves the host->device upload (the dominant cost of single-stream
    sequential latency on relayed/PCIe-attached chips): 16 bits/coord give
    ~3 mm resolution over a +/-100 m LiDAR range, far below sensor noise.
    Dequantization (q * scale + offset) runs inside the jitted encode.
    """
    lo = pts.min(axis=0)
    scale = np.maximum(
        (pts.max(axis=0) - lo) / 65535.0, 1e-12
    ).astype(np.float32)
    q = np.round((pts - lo) / scale).astype(np.uint16)
    return q, lo.astype(np.float32), scale


def _make_encode_fns(model, upload_dtype: str):
    """(encode, encode_q): jitted encode from f32 clouds and, for
    ``upload_dtype='uint16'``, from quantized uploads."""
    encode = jax.jit(
        lambda v, pts, mask: model.apply(v, pts, mask, method=DeepCLR.encode)
    )
    if upload_dtype == "float32":
        return encode, None
    if upload_dtype != "uint16":
        raise ValueError(f"unsupported upload_dtype: {upload_dtype}")
    import jax.numpy as jnp

    def encode_q(v, q, offset, scale, mask):
        pts = (q.astype(jnp.float32) * scale[:, None, :]
               + offset[:, None, :])
        return model.apply(v, pts, mask, method=DeepCLR.encode)

    return encode, jax.jit(encode_q)


def _make_step_fns(model, upload_dtype: str):
    """(step, step_q): jitted fused encode+register of one new frame
    against cached features (DeepCLR.encode_register) — ONE dispatch per
    sequential frame instead of two."""
    step = jax.jit(
        lambda v, f0, pts, mask: model.apply(
            v, f0, pts, mask, method=DeepCLR.encode_register)
    )
    if upload_dtype == "float32":
        return step, None
    import jax.numpy as jnp

    def step_q(v, f0, q, offset, scale, mask):
        pts = (q.astype(jnp.float32) * scale[:, None, :]
               + offset[:, None, :])
        return model.apply(v, f0, pts, mask, method=DeepCLR.encode_register)

    return step, jax.jit(step_q)


class ModelInferenceHelper:
    """Stateful convenience wrapper over the pure encode/register functions."""

    def __init__(self, model: DeepCLR, variables, is_sequential: bool = False,
                 num_points: int = 16384, seed: int = 0,
                 upload_dtype: str = "float32"):
        self._model = model
        self._variables = variables
        self._input_dim = model.input_dim
        self._is_sequential = is_sequential
        self._num_points = num_points
        self._state = None
        self._rng = np.random.default_rng(seed)
        # model built with presorted=True -> sort on host at pad time
        # (models/pointnet2.py SetAbstractionMSG.presorted)
        self._morton = bool(getattr(model.cloud_features, "presorted", False))

        self._encode, self._encode_q = _make_encode_fns(model, upload_dtype)
        self._register = jax.jit(
            lambda v, f0, f1: model.apply(v, f0, f1, method=DeepCLR.register)
        )
        self._step, self._step_q = _make_step_fns(model, upload_dtype)

    def has_state(self) -> bool:
        return self._state is not None

    def reset_state(self) -> None:
        """Drop cached features, e.g. when a new sequence starts."""
        self._state = None

    def _check_dim(self, cloud: np.ndarray, name: str) -> np.ndarray:
        if cloud.shape[1] > self._input_dim:
            cloud = cloud[:, : self._input_dim]
        elif cloud.shape[1] < self._input_dim:
            raise RuntimeError(f"Wrong point dimension in {name}.")
        return cloud

    def encode_cloud(self, cloud: np.ndarray):
        """Encode one raw cloud (N, D) -> (1, P, 3+C) device features."""
        cloud = self._check_dim(np.asarray(cloud), "cloud")
        pts, mask = pad_cloud(cloud, self._num_points, self._rng,
                              morton=self._morton)
        if self._encode_q is not None:
            q, lo, scale = _quantize_u16(pts)
            return self._encode_q(self._variables, q[None], lo[None],
                                  scale[None], mask[None])
        return self._encode(self._variables, pts[None], mask[None])

    def predict_batch(self, sources, templates) -> np.ndarray:
        """Pairwise prediction for B independent pairs in one dispatch.

        ``sources`` / ``templates``: sequences of B raw (N_i, D) clouds.
        Returns (B, label_dim).  Pairwise mode only — for batched
        *sequential* replay use :class:`BatchedSequentialHelper`.
        """
        if self._is_sequential:
            raise RuntimeError(
                "predict_batch is pairwise-only; use BatchedSequentialHelper "
                "for batched sequential prediction."
            )
        if len(sources) != len(templates):
            raise RuntimeError("sources and templates must have equal length.")
        f0 = self._encode_stack(templates)
        f1 = self._encode_stack(sources)
        return np.asarray(self._register(self._variables, f0, f1))

    def _encode_stack(self, clouds):
        pts, masks = [], []
        for cloud in clouds:
            cloud = self._check_dim(np.asarray(cloud), "cloud")
            p, m = pad_cloud(cloud, self._num_points, self._rng,
                             morton=self._morton)
            pts.append(p)
            masks.append(m)
        if self._encode_q is not None:
            qs = [_quantize_u16(p) for p in pts]
            return self._encode_q(
                self._variables,
                np.stack([q for q, _, _ in qs]),
                np.stack([lo for _, lo, _ in qs]),
                np.stack([s for _, _, s in qs]),
                np.stack(masks),
            )
        return self._encode(self._variables, np.stack(pts), np.stack(masks))

    def predict(self, source: np.ndarray,
                template: Optional[np.ndarray] = None) -> Optional[np.ndarray]:
        """Predict the transform aligning source to template.

        Sequential mode: pass only ``source`` per frame; returns None on the
        first frame (no template yet).  Pairwise mode: pass both clouds.
        """
        if self._is_sequential:
            if template is not None:
                raise RuntimeError(
                    "Only the source cloud is required for sequential prediction."
                )
            if self._state is None:
                self._state = self.encode_cloud(source)
                return None
            # fused encode+register: one dispatch per frame
            cloud = self._check_dim(np.asarray(source), "source")
            pts, mask = pad_cloud(cloud, self._num_points, self._rng,
                                  morton=self._morton)
            if self._step_q is not None:
                q, lo, scale = _quantize_u16(pts)
                y, feats = self._step_q(self._variables, self._state,
                                        q[None], lo[None], scale[None],
                                        mask[None])
            else:
                y, feats = self._step(self._variables, self._state,
                                      pts[None], mask[None])
            self._state = feats
            return np.asarray(y[0])

        if template is None:
            raise RuntimeError(
                "Source and template clouds are required for non-sequential prediction."
            )
        f0 = self.encode_cloud(template)
        f1 = self.encode_cloud(source)
        y = self._register(self._variables, f0, f1)
        return np.asarray(y[0])


class BatchedSequentialHelper:
    """Sequential odometry over B independent streams in lock-step.

    Throughput mode for multi-sequence replay (batch evaluation over a whole
    scenario, offline mapping): each :meth:`step` consumes ONE frame per
    stream, encodes all B clouds in a single device dispatch and registers
    them against each stream's cached previous-frame features — so the
    per-dispatch overhead that dominates single-stream latency is amortized
    B ways, and the encode/register programs run at their batched
    throughput.  Predictions are identical to B independent
    :class:`ModelInferenceHelper` instances driven frame by frame (pinned by
    ``tests/model/test_modules.py::test_batched_sequential_matches_single``).

    Streams are independent: :meth:`reset_stream` starts a new sequence on
    one lane only (its next step seeds state and yields ``None``, like the
    reference helper's first frame, ``/root/reference/deepclr/models/base.py:75-99``).
    """

    def __init__(self, model: DeepCLR, variables, batch: int,
                 num_points: int = 16384, seed: int = 0,
                 upload_dtype: str = "float32"):
        self._model = model
        self._variables = variables
        self._input_dim = model.input_dim
        self._batch = batch
        self._num_points = num_points
        self._state = None  # (B, P, 3+C) previous-frame features
        self._fresh = np.ones(batch, bool)  # lanes without a template yet
        # per-stream rngs so lane i subsamples exactly like a standalone
        # helper constructed with seed+i
        self._rngs = [np.random.default_rng(seed + i) for i in range(batch)]
        self._morton = bool(getattr(model.cloud_features, "presorted", False))

        self._encode, self._encode_q = _make_encode_fns(model, upload_dtype)
        self._register = jax.jit(
            lambda v, f0, f1: model.apply(v, f0, f1, method=DeepCLR.register)
        )
        self._step_fn, self._step_fn_q = _make_step_fns(model, upload_dtype)

    def reset_stream(self, i: int) -> None:
        """Start a new sequence on lane ``i`` (next step only seeds state)."""
        self._fresh[i] = True

    def reset_all(self) -> None:
        self._fresh[:] = True
        # drop previous-group features so the next step() only seeds state
        # (a retained _state would trigger one dead register dispatch whose
        # outputs are discarded via _fresh)
        self._state = None

    def step(self, clouds) -> list:
        """Advance every stream by one frame.

        ``clouds``: sequence of B raw (N_i, D) arrays (one frame per
        stream; lanes may differ in point count).  Returns a list of B
        entries — (label_dim,) prediction, or ``None`` for lanes whose
        stream just (re)started.  A finished stream can keep receiving its
        last frame; ignore its outputs.
        """
        if len(clouds) != self._batch:
            raise RuntimeError(
                f"Expected {self._batch} clouds, got {len(clouds)}."
            )
        pts, masks = [], []
        for i, cloud in enumerate(clouds):
            cloud = np.asarray(cloud)
            if cloud.shape[1] > self._input_dim:
                cloud = cloud[:, : self._input_dim]
            elif cloud.shape[1] < self._input_dim:
                raise RuntimeError(f"Wrong point dimension in stream {i}.")
            p, m = pad_cloud(cloud, self._num_points, self._rngs[i],
                             morton=self._morton)
            pts.append(p)
            masks.append(m)
        if self._state is None:
            # seeding step: encode only (no template to register against)
            if self._encode_q is not None:
                qs = [_quantize_u16(p) for p in pts]
                feats = self._encode_q(
                    self._variables,
                    np.stack([q for q, _, _ in qs]),
                    np.stack([lo for _, lo, _ in qs]),
                    np.stack([s for _, _, s in qs]),
                    np.stack(masks),
                )
            else:
                feats = self._encode(self._variables, np.stack(pts),
                                     np.stack(masks))
            self._state = feats
            self._fresh[:] = False
            return [None] * self._batch

        # fused encode+register: one dispatch advances all B streams
        if self._step_fn_q is not None:
            qs = [_quantize_u16(p) for p in pts]
            y_dev, feats = self._step_fn_q(
                self._variables, self._state,
                np.stack([q for q, _, _ in qs]),
                np.stack([lo for _, lo, _ in qs]),
                np.stack([s for _, _, s in qs]),
                np.stack(masks),
            )
        else:
            y_dev, feats = self._step_fn(self._variables, self._state,
                                         np.stack(pts), np.stack(masks))
        y = np.asarray(y_dev)
        out = [None if self._fresh[i] else y[i] for i in range(self._batch)]
        self._state = feats
        self._fresh[:] = False
        return out
