"""Primitive NN building blocks (L0 layer), NHWC, flax.linen.

TPU-native re-design of the reference's layer zoo
(nerve_cl/models/layers/efficient_layers.py:1-343). Same architectural
semantics — depthwise-separable convs, sub-pixel upsampling, CBAM attention,
(2+1)D temporal convs — but as pure functional modules in NHWC layout so XLA
tiles every conv onto the MXU, with BatchNorm carried in a mutable
``batch_stats`` collection (torch momentum 0.1 ⇔ flax momentum 0.9,
eps 1e-5 for parity).

The correlation layer lives in :mod:`nerve_tpu.ops.correlation` (it is an op
with a Pallas kernel, not a parameterised module — the reference's
``LiteFlowNetCorrelation`` has no weights either, efficient_layers.py:297-343).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from nerve_tpu import ops

Dtype = Any


class ConvParams(nn.Module):
    """Declares an ``nn.Conv``-compatible (kernel, bias) pair and returns it.

    Lets modules route convs through the fused conv-chain kernel
    (:mod:`nerve_tpu.ops.conv_chain`) while keeping the exact parameter tree
    an ``nn.Conv`` of the same name would produce — checkpoints and init
    remain interchangeable with the plain-XLA formulation.
    """

    features: int
    kernel_size: Tuple[int, int]
    in_features: int
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        k = self.param(
            "kernel",
            self.kernel_init,
            (*self.kernel_size, self.in_features, self.features),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return k, b


def maybe_quantized_chain(mod: nn.Module, name: str, x, entries,
                          chain_quant: str = "off",
                          use_pallas: Optional[bool] = None):
    """Route a fused conv chain through static-PTQ int8 when asked.

    ``entries``: ``[(kernel, bias, act), ...]`` as for
    :func:`nerve_tpu.ops.conv_chain_apply`. ``chain_quant``:

      * ``"off"``       — production bf16/f32 fused chain (default).
      * ``"serve"``     — int8 weights+activations with STATIC scales read
        from the module's ``"quant"`` collection entry ``name`` (built by
        :mod:`nerve_tpu.models.quantize`); f32 epilogues
        (:mod:`nerve_tpu.ops.conv_chain_int8`).
      * ``"calibrate"`` — compute max-abs activation scales from THIS
        input, store the pre-quantised chain into the mutable ``"quant"``
        collection, and return the EXACT f32/bf16 result so downstream
        sites calibrate on the true (unquantised) distribution.

    No reference analogue (nerve_cl serves f32 torch end to end); this is
    the TPU v5e 394-TOPS serving path, VERDICT r3 item #2.
    """
    if chain_quant == "off":
        return ops.conv_chain_apply(x, entries, use_pallas=use_pallas)
    if chain_quant not in ("serve", "calibrate"):
        raise ValueError(f"unknown chain_quant {chain_quant!r}")
    from nerve_tpu.ops import conv_chain_int8 as cc8

    params = [
        (jnp.asarray(k, jnp.float32), jnp.asarray(b, jnp.float32), act)
        for k, b, act in entries
    ]
    acts = tuple(act for _k, _b, act in entries)
    # The variable stores ARRAYS only ((qlayers, s_in) — the act strings are
    # static structure, rebuilt from ``entries``): the calibration pass runs
    # under jit and returns this collection as a jit output.
    qvar = mod.variable(
        "quant", name,
        # Structure-valid default (unit act scales) so init works; real
        # scales come from the calibration pass.
        lambda: cc8.quantize_conv_chain(
            params, jnp.ones((len(params) + 1,), jnp.float32)
        )[:2],
    )
    if chain_quant == "calibrate":
        if not mod.is_initializing():
            scales = cc8.calibrate_conv_chain(x, params)
            qvar.value = cc8.quantize_conv_chain(params, scales)[:2]
        return ops.conv_chain_apply(x, entries, use_pallas=use_pallas)
    out_cout = entries[-1][0].shape[-1]
    dt = x[0].dtype if isinstance(x, (list, tuple)) else x.dtype
    qlayers, s_in = qvar.value
    return cc8.conv_chain_int8_apply(
        x, (qlayers, s_in, acts), out_cout, out_dtype=dt
    )


class QuantizableConv(nn.Module):
    """One fused 3×3 conv (+activation) with optional int8 serving.

    Parameter tree is IDENTICAL to :class:`ConvParams` at the same name
    (``kernel``/``bias`` on this module's scope), so checkpoints trained
    against the plain formulation load unchanged; ``chain_quant`` adds the
    ``"quant"`` collection entry ``qconv`` (see
    :func:`maybe_quantized_chain`).
    """

    features: int
    in_features: int
    act: str = "none"
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Dtype = jnp.float32
    chain_quant: str = "off"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = self.param(
            "kernel", self.kernel_init,
            (3, 3, self.in_features, self.features), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        # train forces the exact path: int8 static scales are serving-only
        # (stale under weight updates and non-differentiable) — round-4
        # advisor finding, now gated consistently at every chain site.
        return maybe_quantized_chain(
            self, "qconv", x.astype(self.dtype), [(k, b, self.act)],
            "off" if train else self.chain_quant,
        )


class _KernelParams(nn.Module):
    """Bias-free ``nn.Conv``-compatible kernel declaration (returns it)."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape,
                          jnp.float32)


class _BNParams(nn.Module):
    """``nn.BatchNorm``-compatible parameter/stat declaration (returns them).

    Tree-identical to flax BatchNorm (params scale/bias, batch_stats
    mean/var) so checkpoints stay interchangeable with the module form.
    """

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,), jnp.float32))
        return scale, bias, mean, var


class DepthwiseSeparableConv(nn.Module):
    """Depthwise 3×3 + pointwise 1×1 + BN + ReLU.

    Parity: efficient_layers.py:9-67 (bias-free convs, BN after pointwise).

    ``use_fused`` routes eval-mode forwards through the conv-chain Pallas
    kernel with the BN affine folded into the pointwise kernel. DEFAULT OFF:
    measured SLOWER than XLA at both 32 and 64 channels (lightweight model
    28.5→79 ms/frame) — per-block pallas launches + pad round-trips +
    lane-broadcast taps lose to XLA's fused conv pipeline for these small
    channel counts. Kept for future Mosaic improvements; training always
    uses the unfused path with live batch statistics (flax momentum 0.9 ⇔
    torch 0.1, eps 1e-5 — identical to nn.BatchNorm).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, as_entries: bool = False
    ):
        in_ch = x.shape[-1]
        kd = _KernelParams(
            (self.kernel_size, self.kernel_size, 1, in_ch), name="depthwise"
        )()
        kp = _KernelParams((1, 1, in_ch, self.features), name="pointwise")()
        scale, bias, mean_v, var_v = _BNParams(self.features, name="BatchNorm_0")()
        eps = 1e-5

        if as_entries:
            # Return this block's conv-chain entries (BN affine folded into
            # the pointwise conv, eval statistics) WITHOUT computing — lets a
            # parent fuse several DWSep blocks plus its own convs into ONE
            # Pallas launch (see LightweightSuperResolution). Per-block
            # launches were measured SLOWER than XLA (each pays an HBM
            # pad/unpad round-trip of the full activation); one whole-body
            # launch keeps every intermediate in VMEM.
            if train or self.stride != 1 or self.kernel_size != 3:
                raise ValueError(
                    "as_entries requires eval mode, stride 1, kernel 3"
                )
            inv = scale / jnp.sqrt(var_v.value + eps)
            return (
                (kd[:, :, 0, :], jnp.zeros((in_ch,), kd.dtype), "none"),
                (kp * inv[None, None, None, :], bias - mean_v.value * inv,
                 "relu"),
            )

        if (not train and self.use_fused and self.stride == 1
                and self.kernel_size == 3):
            inv = scale / jnp.sqrt(var_v.value + eps)
            kp_f = kp * inv[None, None, None, :]
            b_f = bias - mean_v.value * inv
            y = ops.conv_chain_apply(
                x.astype(self.dtype),
                [
                    (kd[:, :, 0, :], jnp.zeros((in_ch,), kd.dtype), "none"),
                    (kp_f, b_f, "relu"),
                ],
            )
            return y

        import jax.lax as lax

        dn = lax.conv_dimension_numbers(x.shape, kd.shape, ("NHWC", "HWIO", "NHWC"))
        # torch-style padding=k//2 for every kernel size: explicit symmetric
        # padding, never XLA "SAME" (which is asymmetric for stride>1 and
        # would silently diverge from the reference's nn.Conv2d semantics).
        p = self.kernel_size // 2
        y = lax.conv_general_dilated(
            x.astype(self.dtype), kd.astype(self.dtype),
            (self.stride, self.stride), [(p, p), (p, p)],
            dimension_numbers=dn, feature_group_count=in_ch,
        )
        dn2 = lax.conv_dimension_numbers(y.shape, kp.shape, ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(
            y, kp.astype(self.dtype), (1, 1), "SAME", dimension_numbers=dn2
        )
        if train:
            yf = y.astype(jnp.float32)
            m = jnp.mean(yf, axis=(0, 1, 2))
            v = jnp.mean(jnp.square(yf - m), axis=(0, 1, 2))
            if not self.is_initializing() and self.is_mutable_collection("batch_stats"):
                mean_v.value = 0.9 * mean_v.value + 0.1 * m
                var_v.value = 0.9 * var_v.value + 0.1 * v
        else:
            m, v = mean_v.value, var_v.value
        # Affine in the compute dtype (nn.BatchNorm(dtype=...) semantics):
        # per-channel scalars fold to compute-dtype constants, the big tensor
        # never round-trips f32.
        sc = (scale / jnp.sqrt(v + eps)).astype(self.dtype)
        sh = (bias - m * (scale / jnp.sqrt(v + eps))).astype(self.dtype)
        return nn.relu(y.astype(self.dtype) * sc + sh)


class PixelShuffleUpsampler(nn.Module):
    """3×3 conv to C·s² channels followed by depth-to-space.

    Parity: efficient_layers.py:70-106. ``zero_init`` zero-initialises the
    conv — standard residual-learning practice when the upsampler feeds a
    "+ bicubic base" skip: the model starts exactly at the interpolation
    baseline and training strictly improves on it (random init instead makes
    the net spend its early epochs un-learning a noise residual).
    """

    scale_factor: int = 2
    out_channels: int = 3
    zero_init: bool = False
    shuffle: bool = True  # False → return pre-shuffle (B,H,W,C·s²) phase channels
    dtype: Dtype = jnp.float32
    chain_quant: str = "off"  # int8 serving (see maybe_quantized_chain)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = self.out_channels * self.scale_factor**2
        init = nn.initializers.zeros_init() if self.zero_init else nn.initializers.lecun_normal()
        k, b = ConvParams(hidden, (3, 3), x.shape[-1], kernel_init=init, name="conv")()
        x = maybe_quantized_chain(
            self, "qconv", x.astype(self.dtype), [(k, b, "none")],
            "off" if train else self.chain_quant,
        )
        if not self.shuffle:
            return x
        return ops.pixel_shuffle(x, self.scale_factor)


class ResidualBlock(nn.Module):
    """Two conv blocks with identity skip; efficient path = DW-separable convs.

    Parity: efficient_layers.py:109-151 (conv1 = DWSepConv(BN+ReLU),
    conv2 = depthwise+pointwise+BN without activation, then add + ReLU).
    """

    use_efficient: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        channels = x.shape[-1]
        identity = x
        if self.use_efficient:
            out = DepthwiseSeparableConv(channels, dtype=self.dtype, name="conv1")(
                x, train
            )
            out = nn.Conv(
                channels,
                (3, 3),
                padding=1,
                feature_group_count=channels,
                use_bias=False,
                dtype=self.dtype,
                name="conv2_dw",
            )(out)
            out = nn.Conv(
                channels, (1, 1), use_bias=False, dtype=self.dtype, name="conv2_pw"
            )(out)
        else:
            out = nn.Conv(
                channels, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv1"
            )(x)
            out = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn1",
            )(out)
            out = nn.relu(out)
            out = nn.Conv(
                channels, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2"
            )(out)
        out = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn2",
        )(out)
        return nn.relu(out + identity)


class ChannelAttention(nn.Module):
    """SE-style channel attention. Parity: efficient_layers.py:154-180.

    ``spatial_axis``/``spatial_halo``: when the frame is height-sharded over
    a mesh axis (nerve_tpu.parallel.spatial), the global average pool is
    computed over the full frame via ``lax.psum`` of per-shard interior sums
    (halo rows excluded to avoid double counting) — keeping the sharded
    forward exactly equal to the single-device one despite this module's
    global (non-local) statistic.
    """

    reduction: int = 16
    dtype: Dtype = jnp.float32
    spatial_axis: Optional[str] = None
    spatial_halo: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        channels = x.shape[-1]
        if self.spatial_axis is not None:
            import jax.lax as lax

            lo = self.spatial_halo
            hi = x.shape[-3] - self.spatial_halo
            interior = x[..., lo:hi, :, :]
            local = jnp.sum(interior.astype(jnp.float32), axis=(-3, -2))
            rows = jnp.asarray(float(hi - lo), jnp.float32)
            total = lax.psum(local, self.spatial_axis)
            nrows = lax.psum(rows, self.spatial_axis)
            y = (total / (nrows * x.shape[-2])).astype(x.dtype)  # (B, C)
        else:
            y = ops.global_avg_pool(x)  # (B, C)
        y = nn.Dense(max(1, channels // self.reduction), use_bias=False, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Dense(channels, use_bias=False, dtype=self.dtype)(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class SpatialAttention(nn.Module):
    """Mean/max channel-pool → 7×7 conv → sigmoid mask.

    Parity: efficient_layers.py:183-205.
    """

    kernel_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # Plane-based formulation: (B, H, W, 1..2)-channel tensors pick up
        # 128-lane-padded TPU layouts (measured ~40× memory blow-up and tens
        # of ms per op at 1080p), so the channel pools and the 7×7/2→1 conv
        # are computed on (B, H, W) planes via statically shifted adds —
        # identical math and identical (k, k, 2, 1) parameter.
        avg = jnp.mean(x, axis=-1)  # (B, H, W)
        mx = jnp.max(x, axis=-1)
        kernel = self.param(
            "conv_kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, 2, 1),
            jnp.float32,
        ).astype(self.dtype)
        r = self.kernel_size // 2
        pads = ((0, 0), (r, r), (r, r))
        avg_p = jnp.pad(avg.astype(self.dtype), pads)
        mx_p = jnp.pad(mx.astype(self.dtype), pads)
        h, w = x.shape[1], x.shape[2]
        y = jnp.zeros_like(avg, dtype=jnp.float32)
        for dy in range(self.kernel_size):
            for dx in range(self.kernel_size):
                y = y + (
                    avg_p[:, dy : dy + h, dx : dx + w] * kernel[dy, dx, 0, 0]
                    + mx_p[:, dy : dy + h, dx : dx + w] * kernel[dy, dx, 1, 0]
                ).astype(jnp.float32)
        return x * nn.sigmoid(y.astype(self.dtype))[..., None]


class CBAM(nn.Module):
    """Channel attention followed by spatial attention.

    Parity: efficient_layers.py:208-228. ``spatial_axis``/``spatial_halo``
    propagate to the (global-pooling) channel attention — see
    ChannelAttention.
    """

    reduction: int = 16
    dtype: Dtype = jnp.float32
    spatial_axis: Optional[str] = None
    spatial_halo: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = ChannelAttention(
            self.reduction, dtype=self.dtype,
            spatial_axis=self.spatial_axis, spatial_halo=self.spatial_halo,
        )(x)
        return SpatialAttention(dtype=self.dtype)(x)


def _temporal_mid_channels(in_ch: int, out_ch: int, tk: int) -> int:
    """(2+1)D mid-channel formula — parity with efficient_layers.py:253-256."""
    mid = (in_ch * out_ch * 3 * 3 * tk) // (in_ch * 3 * 3 + out_ch * tk)
    return max(mid, out_ch // 2)


class TemporalConv3D(nn.Module):
    """(2+1)D-factorised 3D conv: 1×3×3 spatial then T×1×1 temporal, each BN+ReLU.

    Layout: (B, T, H, W, C). Parity: efficient_layers.py:231-294 (reference is
    NCTHW; channel math identical).
    """

    features: int
    temporal_kernel: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        mid = _temporal_mid_channels(in_ch, self.features, self.temporal_kernel)
        x = nn.Conv(
            mid,
            (1, 3, 3),
            padding=((0, 0), (1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
            name="spatial",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="spatial_bn",
        )(x)
        x = nn.relu(x)
        tp = self.temporal_kernel // 2
        x = nn.Conv(
            self.features,
            (self.temporal_kernel, 1, 1),
            padding=((tp, tp), (0, 0), (0, 0)),
            use_bias=False,
            dtype=self.dtype,
            name="temporal",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="temporal_bn",
        )(x)
        return nn.relu(x)
