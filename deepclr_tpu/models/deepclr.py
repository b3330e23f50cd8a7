"""DeepCLR network, TPU-native.

Re-architecture of the reference model
(/root/reference/deepclr/models/deepclr.py:48-521): per-cloud PointNet++ set
abstraction -> cross-cloud motion embedding (kNN grouping) -> mini-PointNet
pose head emitting a LabelType-parameterized transform, with optional in-model
loss layers.

Differences by design (TPU-first):
  * clouds are fixed-shape padded arrays with validity masks; no dynamic
    cropping (reference crops each batch to its min cloud size,
    data/build.py:61-99),
  * template and source are explicit arguments instead of a stacked 2B batch;
    the encoder is still shared (vmapped over both clouds in one call site),
  * everything is a pure function of (params, inputs); the encode / register
    split that powers sequential odometry inference is preserved as two
    flax methods.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import ops
from ..geometry import LabelType, se3
from ..losses import rot_loss, trans_loss
from .layers import MLP
from .pointnet2 import SetAbstractionMSG

__all__ = [
    "SetAbstraction",
    "MotionEmbedding",
    "OutputSimple",
    "TransformLoss",
    "TransformUncertaintyLoss",
    "AccumulatedLoss",
    "DeepCLR",
]


class SetAbstraction(nn.Module):
    """1-2 stacked MSG set-abstraction stages (reference SetAbstraction).

    Config lists are indexed by stage, e.g. npoint=[1024],
    radii=[[0.5, 1.0]], nsamples=[[512, 1024]], mlps=[[[16,16,32],[16,16,32]]].
    """

    npoint: Sequence[int]
    radii: Sequence[Sequence[float]]
    nsamples: Sequence[Sequence[int]]
    mlps: Sequence[Sequence[Sequence[int]]]
    batch_norm: bool = False
    compute_dtype: jnp.dtype = jnp.float32
    fused: bool = True
    presorted: bool = False  # stage-0 input Morton-ordered by the host pipeline

    @nn.compact
    def __call__(self, points, mask=None, *, train: bool = False):
        """points: (B, N, D) xyz+features, mask: (B, N) -> (B, P, 3+F)."""
        assert len(self.npoint) == len(self.radii) == len(self.nsamples) == len(self.mlps)
        assert 0 < len(self.npoint) <= 2

        xyz = points[..., :3]
        features = points[..., 3:] if points.shape[-1] > 3 else None

        for stage in range(len(self.npoint)):
            xyz, features = SetAbstractionMSG(
                npoint=int(self.npoint[stage]),
                radii=tuple(self.radii[stage]),
                nsamples=tuple(int(n) for n in self.nsamples[stage]),
                mlps=tuple(tuple(m) for m in self.mlps[stage]),
                use_xyz=True,
                batch_norm=self.batch_norm,
                compute_dtype=self.compute_dtype,
                fused=self.fused,
                # later stages consume FPS centers, which are never host-ordered
                presorted=self.presorted and stage == 0,
                name=f"sa{stage}",
            )(xyz, features, mask=mask, train=train)
            # After the first stage every center is a real (possibly
            # duplicated) point, so downstream stages need no mask.
            mask = None

        return jnp.concatenate([xyz, features], axis=-1)


class MotionEmbedding(nn.Module):
    """Cross-cloud motion embedding (reference MotionEmbeddingBase).

    For each template point: its k nearest source points (k=0 -> all source
    points), per-pair features [Δpos | feat_template | feat_source] through a
    shared MLP, neighbors beyond ``radius`` zeroed, max-pooled over neighbors.
    Output: template xyz ‖ motion feature, (B, P, 3 + mlp[-1]).
    """

    mlp: Sequence[int]
    k: int = 20
    radius: float = 10.0
    point_dim: int = 3
    append_features: bool = True
    batch_norm: bool = False
    compute_dtype: jnp.dtype = jnp.float32
    # layer-1 term gather: "take" (exact row gather), "onehot" (MXU
    # one-hot select, hi/lo bf16 passes), "auto" = onehot on TPU.  Row
    # gathers are per-row priced on TPU (~3 ms for the flagship's 164k
    # k-neighbor rows) and differentiate to a scatter-add; the one-hot
    # matmul is ~2x faster forward and its backward is the transposed
    # matmul.  Rows reconstruct to ~2^-16 relative (hi+lo), below the
    # bf16 tail's own rounding.
    gather: str = "auto"

    @nn.compact
    def __call__(self, feats0, feats1, *, train: bool = False):
        """feats0 (template), feats1 (source): (B, P, 3+C) -> (B, P, 3+F).

        The MLP's first layer is affine in [Δpos | f0 | f1], so it splits
        into a per-source term A_j = x_j·Wd + f1_j·Wf + b and a per-template
        term B_p = -c_p·Wd + f0_p·W0; the neighbor gather then moves AFTER
        the first matmul (k·|cloud| fewer layer-1 FLOPs, no (B,P,k,Cin)
        merged tensor).  Layer 1 runs in float32 — the split subtracts
        large absolute coordinates (x_j·Wd - c_p·Wd), which bf16 cannot
        cancel accurately; tail layers run in compute_dtype like the MLP
        module they replace.  Falls back to the literal concat+MLP
        formulation when batch_norm is on (validation-path parity).
        """
        pd = self.point_dim
        xyz0, f0 = feats0[..., :pd], feats0[..., pd:]
        xyz1, f1 = feats1[..., :pd], feats1[..., pd:]

        in_dim = pd + (f0.shape[-1] + f1.shape[-1] if self.append_features
                       else f1.shape[-1])
        mlp = MLP(
            tuple(self.mlp),
            batch_norm=self.batch_norm,
            compute_dtype=self.compute_dtype,
            name="mlp",
        )
        if self.batch_norm:
            return self._naive(mlp, feats0, feats1, train=train)

        if self.k > 0:
            # kNN runs on detached coordinates (reference detaches too); the
            # indices are integers so no gradient flows regardless.  The
            # returned squared distances also serve the radius mask below —
            # the reference recomputes ‖Δpos‖ from a gathered (B,P,k,3)
            # coordinate tensor, but that gather feeds only the mask
            # *condition*, which carries no gradient, so reusing d² is
            # gradient- and value-equivalent (modulo f32 rounding at the
            # radius boundary) and drops a 164k-row gather + norm.
            idx, nbr_d2 = ops.knn(
                jax.lax.stop_gradient(xyz0), jax.lax.stop_gradient(xyz1), self.k
            )

        # instantiate the MLP params without running it (output unused ->
        # XLA removes the compute; the param tree stays checkpoint-identical)
        _ = mlp(jnp.zeros((1, in_dim), jnp.float32))
        params = mlp.variables["params"]
        w1 = params["dense_0"]["kernel"]
        b1 = params["dense_0"]["bias"]
        wd = w1[:pd]
        hp = jax.lax.Precision.HIGHEST
        if self.append_features:
            w0 = w1[pd:pd + f0.shape[-1]]
            wf = w1[pd + f0.shape[-1]:]
        else:
            w0 = -w1[pd:]
            wf = w1[pd:]
        a = jnp.dot(xyz1, wd, precision=hp) + jnp.dot(f1, wf, precision=hp) + b1
        bp = jnp.dot(f0, w0, precision=hp) - jnp.dot(xyz0, wd, precision=hp)

        if self.k == 0:
            h = jnp.maximum(a[:, None, :, :] + bp[:, :, None, :], 0.0)
            pos_diff = xyz1[:, None, :, :] - xyz0[:, :, None, :]
            beyond = jnp.linalg.norm(pos_diff, axis=-1, keepdims=True) \
                >= self.radius
        else:
            a_g = self._gather_rows(a, idx)         # (B, P, k, H1)
            h = jnp.maximum(a_g + bp[:, :, None, :], 0.0)
            beyond = (nbr_d2 >= self.radius * self.radius)[..., None]

        cd = self.compute_dtype
        h = h.astype(cd)
        for i in range(1, len(self.mlp)):
            w = params[f"dense_{i}"]["kernel"].astype(cd)
            b = params[f"dense_{i}"]["bias"].astype(cd)
            h = jnp.maximum(jnp.dot(h, w) + b, 0.0)

        if self.radius > 0.0:
            h = jnp.where(beyond, jnp.zeros_like(h), h)

        feat = jnp.max(h, axis=-2).astype(jnp.float32)  # (B, P, F)
        return jnp.concatenate([xyz0, feat], axis=-1)

    def _gather_rows(self, a, idx):
        """Gather (B, P, k, H1) layer-1 term rows from a (B, N, H1) table.

        mode "onehot": the gather runs as one-hot MXU matmuls.  The table
        is split into bf16 hi/lo halves (a = hi + lo with |err| <=
        2^-16·|a|) because a single bf16 pass would truncate the f32 rows;
        each pass selects exactly one row per output so the per-pass
        selection is exact.  Backward: d(a) = onehotᵀ·g — a matmul, where
        the "take" path differentiates to a per-row scatter-add.
        """
        mode = self.gather
        if mode == "auto":
            mode = "onehot" if jax.default_backend() == "tpu" else "take"
        if mode == "take":
            return ops.group_points(a, idx)
        if mode != "onehot":
            raise ValueError(f"Unknown gather mode: {self.gather!r}")
        b, nsrc, h1 = a.shape
        _, p, k = idx.shape
        flat = idx.reshape(b, p * k)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nsrc), 2)
        oh = (flat[..., None] == iota).astype(jnp.bfloat16)
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        rows = (
            jnp.einsum("bqn,bnh->bqh", oh, a_hi,
                       preferred_element_type=jnp.float32)
            + jnp.einsum("bqn,bnh->bqh", oh, a_lo,
                         preferred_element_type=jnp.float32)
        )
        return rows.reshape(b, p, k, h1)

    def _naive(self, mlp, feats0, feats1, *, train: bool):
        """Literal concat+MLP formulation (reference MotionEmbeddingBase)."""
        pd = self.point_dim
        xyz0, f0 = feats0[..., :pd], feats0[..., pd:]

        if self.k == 0:
            p = feats1.shape[1]
            grouped1 = jnp.broadcast_to(
                feats1[:, None, :, :],
                (feats1.shape[0], feats0.shape[1], p, feats1.shape[-1]),
            )
        else:
            idx, _ = ops.knn(
                jax.lax.stop_gradient(xyz0),
                jax.lax.stop_gradient(feats1[..., :pd]), self.k,
            )
            grouped1 = ops.group_points(feats1, idx)  # (B, P, k, 3+C)

        pos_diff = grouped1[..., :pd] - xyz0[:, :, None, :]
        if self.append_features:
            f0_b = jnp.broadcast_to(
                f0[:, :, None, :], pos_diff.shape[:3] + (f0.shape[-1],)
            )
            merged = jnp.concatenate([pos_diff, f0_b, grouped1[..., pd:]], axis=-1)
        else:
            merged = jnp.concatenate(
                [pos_diff, grouped1[..., pd:] - f0[:, :, None, :]], axis=-1
            )

        h = mlp(merged, train=train)

        if self.radius > 0.0:
            dist = jnp.linalg.norm(pos_diff, axis=-1, keepdims=True)
            h = jnp.where(dist >= self.radius, jnp.zeros_like(h), h)

        feat = jnp.max(h, axis=-2).astype(jnp.float32)  # (B, P, F)
        return jnp.concatenate([xyz0, feat], axis=-1)


class OutputSimple(nn.Module):
    """Mini-PointNet + FC pose head (reference OutputSimple).

    ``linear`` follows the reference config contract: its first entry is the
    *input* width (== mlp[-1]) and is not a layer of its own.
    Label-specific activations keep the rotation part bounded: sigmoid on the
    scalar quaternion component, tanh on its vector part.
    """

    mlp: Sequence[int]
    linear: Sequence[int]
    label_type: LabelType
    batch_norm: bool = False
    dropout_keep: float = 1.0
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        """x: (B, P, D) -> (B, label_type.dim)."""
        h = MLP(
            tuple(self.mlp),
            batch_norm=self.batch_norm,
            compute_dtype=self.compute_dtype,
            name="conv",
        )(x, train=train)
        h = jnp.max(h, axis=-2)  # global max over points

        h = MLP(
            tuple(self.linear[1:]),
            batch_norm=self.batch_norm,
            dropout_keep=self.dropout_keep,
            dropout_last=True,
            compute_dtype=self.compute_dtype,
            name="linear",
        )(h, train=train)

        bias = self.label_type.bias

        def bias_init(key, shape, dtype=jnp.float32):
            if bias is None:
                return jnp.zeros(shape, dtype)
            return jnp.asarray(bias, dtype)

        y = nn.Dense(
            self.label_type.dim,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=bias_init,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="output",
        )(h.astype(jnp.float32))

        if self.label_type == LabelType.POSE3D_QUAT:
            y = jnp.concatenate(
                [y[:, :3], nn.sigmoid(y[:, 3:4]), nn.tanh(y[:, 4:])], axis=1
            )
        elif self.label_type == LabelType.POSE3D_DUAL_QUAT:
            y = jnp.concatenate(
                [nn.sigmoid(y[:, 0:1]), nn.tanh(y[:, 1:4]), y[:, 4:]], axis=1
            )
        return y


class TransformLoss(nn.Module):
    """Fixed-weight translation+rotation loss (reference TransformLoss)."""

    label_type: LabelType
    p: int = 2
    sx: float = 1.0
    sq: float = 1.0

    def __call__(self, y_pred, y):
        p_loss = trans_loss(y_pred, y, self.label_type, p=self.p, reduction="mean")
        q_loss = rot_loss(y_pred, y, self.label_type, p=self.p, reduction="mean")
        return p_loss * self.sx + q_loss * self.sq


class TransformUncertaintyLoss(nn.Module):
    """Kendall-style homoscedastic-uncertainty weighting with learned sx/sq
    (reference TransformUncertaintyLoss)."""

    label_type: LabelType
    p: int = 2
    sx: float = 0.0
    sq: float = 0.0

    @nn.compact
    def __call__(self, y_pred, y):
        sx = self.param("sx", lambda k: jnp.asarray([self.sx], jnp.float32))
        sq = self.param("sq", lambda k: jnp.asarray([self.sq], jnp.float32))
        p_loss = trans_loss(y_pred, y, self.label_type, p=self.p, reduction="mean")
        q_loss = rot_loss(y_pred, y, self.label_type, p=self.p, reduction="mean")
        return jnp.sum(
            p_loss * jnp.exp(-sx) + sx + q_loss * jnp.exp(-sq) + sq
        )


class AccumulatedLoss(nn.Module):
    """Sum of multiple loss modules (reference AccumulatedLoss)."""

    losses: Sequence[nn.Module]

    def __call__(self, y_pred, y):
        return sum(loss(y_pred, y) for loss in self.losses)


class DeepCLR(nn.Module):
    """End-to-end correspondence-less registration network.

    Pure-functional contract:
      * ``encode``   — per-cloud feature extraction (SetAbstraction); used
        once per LiDAR frame in sequential odometry inference.
      * ``register`` — motion embedding + pose head on two encoded clouds.
      * ``__call__`` — full training forward: encode both clouds (with
        optional on-device augmentation transforms) and register, returning
        (y_pred, loss | None).
    """

    cloud_features: nn.Module
    merge: nn.Module
    output: nn.Module
    loss_module: Optional[nn.Module] = None
    input_dim: int = 4
    point_dim: int = 3
    label_type: LabelType = LabelType.POSE3D_DUAL_QUAT

    def encode(self, points, mask=None, aug=None, *, train: bool = False):
        """points: (B, N, D); aug: optional (B, 4, 4) transforms baked into
        the first point_dim dims on device (reference cloud_features)."""
        if aug is not None:
            pd = self.point_dim
            xyz = se3.transform_points(aug, points[..., :pd])
            points = jnp.concatenate([xyz, points[..., pd:]], axis=-1)
        return self.cloud_features(points, mask=mask, train=train)

    def register(self, feats0, feats1, *, train: bool = False):
        """Encoded template/source (B, P, 3+C) -> predicted label (B, dim)."""
        merged = self.merge(feats0, feats1, train=train)
        return self.output(merged, train=train)

    def encode_register(self, feats0, points, mask=None, *,
                        train: bool = False):
        """Sequential-step fusion: encode ONE new frame and register it
        against the cached previous-frame features in a single program.

        Halves the per-frame dispatch count on the single-stream odometry
        path, where fixed per-dispatch cost dominates latency (reference
        per-frame timing, /root/reference/scripts/inference.py:95-110).
        Returns ``(y_pred, feats1)`` so the caller can thread the state.
        """
        feats1 = self.encode(points, mask, train=train)
        y_pred = self.register(feats0, feats1, train=train)
        return y_pred, feats1

    def __call__(
        self,
        template,
        source,
        template_mask=None,
        source_mask=None,
        aug_template=None,
        aug_source=None,
        y=None,
        *,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        if template.shape == source.shape:
            # one stacked 2B encode (the reference also runs SetAbstraction
            # on the stacked [templates; sources] batch, data/build.py:61-99):
            # halves the Morton/FPS/fused-SA kernel launches per step and
            # matches reference batch-norm statistics when BN is enabled
            b = template.shape[0]
            both = jnp.concatenate([template, source], axis=0)
            if template_mask is None and source_mask is None:
                mask = None
            else:
                ones = jnp.ones(template.shape[:2], bool)
                mask = jnp.concatenate(
                    [template_mask if template_mask is not None else ones,
                     source_mask if source_mask is not None else ones], axis=0)
            if aug_template is None and aug_source is None:
                aug = None
            else:
                eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                       (b, 4, 4))
                aug = jnp.concatenate(
                    [aug_template if aug_template is not None else eye,
                     aug_source if aug_source is not None else eye], axis=0)
            feats = self.encode(both, mask, aug, train=train)
            feats0, feats1 = feats[:b], feats[b:]
        else:
            feats0 = self.encode(template, template_mask, aug_template,
                                 train=train)
            feats1 = self.encode(source, source_mask, aug_source, train=train)
        y_pred = self.register(feats0, feats1, train=train)

        loss = None
        if self.loss_module is not None and y is not None:
            loss = self.loss_module(y_pred, y)
        return y_pred, loss
