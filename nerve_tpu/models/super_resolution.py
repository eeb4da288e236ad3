"""Temporal super-resolution networks (flax.linen, NHWC, fully batched).

TPU-native re-design of nerve_cl/models/super_resolution.py:
  * The reference's per-frame Python loops (super_resolution.py:346-349 feature
    extraction, :355-363 flow+warp) become single batched computations over a
    folded (B·T) or (B·(T-1)) leading axis — one conv dispatch instead of T.
  * The correlation volume is the Pallas kernel in nerve_tpu.ops.correlation.
  * Warping is the gather-based ``ops.flow_warp`` (grid_sample parity).
  * The bicubic residual base uses the torch-parity A=-0.75 kernel.

Architecture parity (channels, depths, residual scaling) with:
  FeatureExtractor        — super_resolution.py:22-54
  MotionEstimator         — super_resolution.py:57-101
  TemporalAggregator      — super_resolution.py:146-209
  ResidualDenseBlock      — super_resolution.py:212-253
  SuperResolutionNet      — super_resolution.py:256-431
  LightweightSuperResolution — super_resolution.py:434-470

Input contract (native): (B, T, H, W, C) with T == 2*temporal_window + 1;
output (B, H*scale, W*scale, C) in [0, 1]. The reference's channel-first
(B, T, C, H, W) contract is preserved by the facade in nerve_tpu.models.api.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from nerve_tpu import ops
from nerve_tpu.models.layers import (
    CBAM,
    ConvParams,
    DepthwiseSeparableConv,
    PixelShuffleUpsampler,
    QuantizableConv,
    maybe_quantized_chain,
)

Dtype = Any


class FeatureExtractor(nn.Module):
    """Conv head + 3 DW-separable convs with residual. Parity: :22-54."""

    num_features: int = 64
    dtype: Dtype = jnp.float32
    chain_quant: str = "off"  # int8 head conv (see layers.maybe_quantized_chain)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kh, bh = ConvParams(self.num_features, (3, 3), x.shape[-1], name="head")()
        feat = maybe_quantized_chain(
            self, "qhead", x.astype(self.dtype), [(kh, bh, "relu")],
            "off" if train else self.chain_quant,
        )
        blocks = [
            DepthwiseSeparableConv(
                self.num_features, dtype=self.dtype, name=f"body{i}"
            )
            for i in range(3)
        ]
        if train:
            body = feat
            for blk in blocks:
                body = blk(body, True)
        else:
            # BN-folded chain via the XLA formulation: the fused Pallas
            # launch of DWSep stacks measured 4× slower than XLA on v5e for
            # the 32-channel lightweight body (see LightweightSuperResolution
            # for the measurement); at 64 channels the same lane-
            # underutilisation argument applies at 2×, and the streaming
            # pipeline reuses these features so this is not on the hot path.
            chain = []
            for blk in blocks:
                chain.extend(blk(feat, False, as_entries=True))
            body = ops.conv_chain_apply(feat, chain, use_pallas=False)
        return body + feat


class MotionEstimator(nn.Module):
    """Correlation volume → 4-conv flow head → (dx, dy). Parity: :57-101.

    ``downsample`` > 1 estimates flow at reduced resolution (the standard
    LiteFlowNet/PWC-style coarse-level correlation) and bilinearly upsamples
    the flow back, scaling its magnitude — a TPU serving optimisation that
    cuts the cost-volume work by downsample². downsample=1 is the
    reference-exact full-resolution path.
    """

    max_displacement: int = 4
    downsample: int = 1
    dtype: Dtype = jnp.float32
    chain_quant: str = "off"  # int8 flow head (see layers.maybe_quantized_chain)

    @nn.compact
    def __call__(
        self, feat1: jnp.ndarray, feat2: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        ds = self.downsample
        b, h, w, c = feat1.shape
        if ds > 1:
            f1 = nn.avg_pool(feat1, (ds, ds), strides=(ds, ds))
            f2 = nn.avg_pool(feat2, (ds, ds), strides=(ds, ds))
        else:
            f1, f2 = feat1, feat2
        corr = ops.correlation_volume(f1, f2, self.max_displacement)
        corr = corr.astype(self.dtype)
        # Flow head as ONE fused conv chain (zero-initialised last layer:
        # warping starts as the identity, so early training is not
        # destabilised by random-flow gathers).
        nd = corr.shape[-1]
        k0, b0 = ConvParams(128, (3, 3), nd, name="flow0")()
        k1, b1 = ConvParams(64, (3, 3), 128, name="flow1")()
        k2, b2 = ConvParams(32, (3, 3), 64, name="flow2")()
        k3, b3 = ConvParams(
            2, (3, 3), 32, kernel_init=nn.initializers.zeros_init(), name="flow3"
        )()
        flow = maybe_quantized_chain(
            self, "qflow", corr,
            [(k0, b0, "relu"), (k1, b1, "relu"), (k2, b2, "relu"), (k3, b3, "none")],
            "off" if train else self.chain_quant,
        )
        if ds > 1:
            flow = ops.resize_bilinear(flow, (h, w)) * float(ds)
        return flow


class TemporalAggregator(nn.Module):
    """Softmax-over-T attention fusion + CBAM refinement. Parity: :146-209.

    Input: a LIST of T aligned (B, H, W, F) feature maps — kept as 4-D
    tensors end-to-end (5-D stacks of tiny T dims pick up pathological TPU
    layouts). The channel concat is frame-major, matching the reference's
    ``stacked.view(B, T*C, H, W)`` ordering at :197.
    """

    num_features: int = 64
    num_frames: int = 3
    dtype: Dtype = jnp.float32
    spatial_axis: Optional[str] = None
    spatial_halo: int = 0
    chain_quant: str = "off"  # int8 attention chain (layers.maybe_quantized_chain)

    @nn.compact
    def __call__(self, aligned, train: bool = False) -> jnp.ndarray:
        if isinstance(aligned, (list, tuple)):
            frames = list(aligned)
        else:  # (B, T, H, W, F) convenience path
            frames = [aligned[:, i] for i in range(aligned.shape[1])]
        t = len(frames)
        f = frames[0].shape[-1]
        # Attention net as ONE fused conv chain — XLA runs the 3-logit conv
        # at a 128-lane-padded layout (~30 ms at 1080p); the fused kernel
        # pads the output lanes only inside VMEM. The frame list feeds the
        # kernel directly: the T·F channel concat happens in VMEM scratch
        # slots (never materialised in HBM — saved ~7 ms at 1080p).
        k0, b0 = ConvParams(f, (3, 3), t * f, name="attn0")()
        k1, b1 = ConvParams(f, (3, 3), f, name="attn1")()
        k2, b2 = ConvParams(t, (3, 3), f, name="attn2")()
        logits = maybe_quantized_chain(
            self, "qattn", [fr.astype(self.dtype) for fr in frames],
            [(k0, b0, "relu"), (k1, b1, "relu"), (k2, b2, "none")],
            "off" if train else self.chain_quant,
        )
        # Softmax over T computed on (B, H, W) planes: lane-dim reductions of
        # a T=3-channel tensor run against a 128-lane-padded layout (measured
        # ~100 ms at 1080p); elementwise plane math is ~free.
        planes = [logits[..., i].astype(jnp.float32) for i in range(t)]
        m = planes[0]
        for pl_ in planes[1:]:
            m = jnp.maximum(m, pl_)
        exps = [jnp.exp(pl_ - m) for pl_ in planes]
        denom = exps[0]
        for e in exps[1:]:
            denom = denom + e
        inv = (1.0 / denom).astype(self.dtype)
        weighted = frames[0] * (exps[0].astype(self.dtype) * inv)[..., None]
        for i in range(1, t):
            weighted = weighted + frames[i] * (exps[i].astype(self.dtype) * inv)[..., None]
        return CBAM(
            dtype=self.dtype, name="refine",
            spatial_axis=self.spatial_axis, spatial_halo=self.spatial_halo,
        )(weighted)


def _declare_rdb_params(mod: nn.Module, prefix: str, features: int,
                        growth: int, num_layers: int, dtype) -> list:
    """Declare one residual-dense-block's raw parameters on ``mod``."""
    params = []
    cin = features
    for i in range(num_layers):
        k = mod.param(
            f"{prefix}dense{i}_kernel",
            nn.initializers.he_normal(),
            (3, 3, cin, growth),
            jnp.float32,
        )
        b = mod.param(f"{prefix}dense{i}_bias", nn.initializers.zeros, (growth,), jnp.float32)
        params += [k.astype(dtype), b.astype(dtype)]
        cin += growth
    lw = mod.param(f"{prefix}lff_kernel", nn.initializers.lecun_normal(), (cin, features), jnp.float32)
    lb = mod.param(f"{prefix}lff_bias", nn.initializers.zeros, (features,), jnp.float32)
    params += [lw.astype(dtype), lb.astype(dtype)]
    return params


class ResidualDenseBlock(nn.Module):
    """5 dense 3×3 convs + 1×1 fusion + 0.2-scaled residual. Parity: :212-253.

    Parameters are declared explicitly so the forward can dispatch between
    two mathematically-identical implementations: the fused Pallas kernel
    (``nerve_tpu.ops.rdb`` — the whole block in VMEM, one HBM round-trip) on
    TPU, and the XLA conv formulation elsewhere / for autodiff.
    """

    num_features: int = 64
    growth_rate: int = 32
    num_layers: int = 5
    dtype: Dtype = jnp.float32
    use_pallas: bool | None = None  # None → auto (TPU backend only)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from nerve_tpu.ops import rdb as rdb_ops

        params = _declare_rdb_params(
            self, "", self.num_features, self.growth_rate, self.num_layers, self.dtype
        )
        x = x.astype(self.dtype)
        use_pallas = self.use_pallas
        if self.num_layers != rdb_ops.NUM_LAYERS or self.growth_rate != rdb_ops.GROWTH:
            use_pallas = False  # fused kernel is specialised to the 5×32 block
        return rdb_ops.rdb_apply(x, params, use_pallas=use_pallas)


class RDBStack(nn.Module):
    """The SR network's stack of residual dense blocks.

    On TPU the whole stack runs as the fused channel-major Pallas chain
    (one layout transpose in, one out — per-block transposes would otherwise
    sit between every pair of blocks); elsewhere it is the XLA formulation.
    """

    num_features: int = 64
    num_blocks: int = 8
    growth_rate: int = 32
    num_layers: int = 5
    dtype: Dtype = jnp.float32
    use_pallas: bool | None = None
    # int8 serving (the v5e 394-TOPS path): weights/activations int8, f32
    # epilogues, STATIC activation scales. The pre-quantised chain lives in
    # the "quant" variable collection — build it with
    # nerve_tpu.models.quantize.quantize_sr_variables (calibration forward).
    quantized: bool = False
    # Calibration forward: with quantized=True, compute max-abs activation
    # scales from THIS input, store the pre-quantised chain in the mutable
    # "quant" collection, and return the EXACT f32/bf16 result (so
    # downstream sites calibrate on the unquantised distribution).
    quant_calibrate: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from nerve_tpu.ops import rdb as rdb_ops

        params_list = [
            _declare_rdb_params(
                self, f"rdb{b}_", self.num_features, self.growth_rate,
                self.num_layers, self.dtype,
            )
            for b in range(self.num_blocks)
        ]
        x = x.astype(self.dtype)
        use_pallas = self.use_pallas
        if self.num_layers != rdb_ops.NUM_LAYERS or self.growth_rate != rdb_ops.GROWTH:
            use_pallas = False
        if self.quantized:
            # The fused int8 kernel is specialised to the reference's 5×32
            # block; rdb_chain_int8_apply routes any other geometry to the
            # exact generic XLA int8 formulation (quantize_rdb_chain infers
            # num_layers/growth from the param shapes), so quantized=True
            # composes with the whole config space.
            from nerve_tpu.ops import rdb_int8

            params_f32 = [
                [jnp.asarray(p, jnp.float32) for p in prm]
                for prm in params_list
            ]
            qchain = self.variable(
                "quant", "qchain",
                # Structure-valid default (unit act scales) so init works;
                # real scales come from the calibration pass.
                lambda: rdb_int8.quantize_rdb_chain(
                    params_f32,
                    jnp.ones((self.num_blocks, 1 + self.num_layers)),
                    per_channel=rdb_int8.PER_CHANNEL_INT8,
                ),
            )
            if self.quant_calibrate:
                if not self.is_initializing():
                    scales = rdb_int8.calibrate_rdb_chain(
                        x.astype(jnp.float32), params_f32
                    )
                    qchain.value = rdb_int8.quantize_rdb_chain(
                        params_f32, scales,
                        per_channel=rdb_int8.PER_CHANNEL_INT8,
                    )
                return rdb_ops.rdb_chain_apply(
                    x, params_list, use_pallas=use_pallas
                )
            return rdb_int8.rdb_chain_int8_apply(x, qchain.value, out_dtype=x.dtype)
        return rdb_ops.rdb_chain_apply(x, params_list, use_pallas=use_pallas)


class SuperResolutionNet(nn.Module):
    """Flagship motion-compensated temporal SR network. Parity: :256-431.

    Pipeline: batched feature extraction → flow estimation + warp of every
    non-center frame toward the center → attention aggregation → N residual
    dense blocks → global fusion + center skip → pixel-shuffle upsampling →
    bicubic residual base → clamp [0, 1].
    """

    in_channels: int = 3
    scale_factor: int = 2
    num_features: int = 64
    num_residual_blocks: int = 8
    temporal_window: int = 1
    flow_downsample: int = 1  # >1: coarse-level flow (serving optimisation)
    quantized: bool = False  # int8 RDB serving (see RDBStack.quantized)
    # int8 for the conv-chain sites OUTSIDE the RDB stack (feature head,
    # flow head, attention logits, global fusion, upsampler conv) — the
    # round-3 finding was that int8 e2e gained only +14 % because only the
    # RDB chain was quantised (VERDICT r3 item #2). Build the "quant"
    # collection with nerve_tpu.models.quantize.quantize_sr_variables.
    quantized_chains: bool = False
    # Calibration forward (used by models.quantize): every quantised site
    # computes+stores its scales from this input and returns exact math.
    quant_calibrate: bool = False
    dtype: Dtype = jnp.float32
    # Height-sharded inference over a mesh axis (nerve_tpu.parallel.spatial):
    # modules with global statistics (CBAM channel attention) psum over this
    # axis, excluding the halo rows, to stay exact under sharding.
    spatial_axis: Optional[str] = None
    spatial_halo: int = 0

    @property
    def num_frames(self) -> int:
        return 2 * self.temporal_window + 1

    def setup(self):
        cq = (
            "calibrate" if (self.quantized_chains and self.quant_calibrate)
            else ("serve" if self.quantized_chains else "off")
        )
        self.feature_extractor = FeatureExtractor(
            self.num_features, dtype=self.dtype, chain_quant=cq
        )
        self.motion_estimator = MotionEstimator(
            downsample=self.flow_downsample, dtype=self.dtype, chain_quant=cq
        )
        self.temporal_aggregator = TemporalAggregator(
            self.num_features, self.num_frames, dtype=self.dtype,
            spatial_axis=self.spatial_axis, spatial_halo=self.spatial_halo,
            chain_quant=cq,
        )
        self.rdbs = RDBStack(
            self.num_features, self.num_residual_blocks, dtype=self.dtype,
            quantized=self.quantized, quant_calibrate=self.quant_calibrate,
        )
        self.gff = QuantizableConv(
            self.num_features, self.num_features, act="relu",
            dtype=self.dtype, chain_quant=cq,
        )
        self.upsampler = PixelShuffleUpsampler(
            self.scale_factor, self.in_channels, zero_init=True, shuffle=False,
            dtype=self.dtype, chain_quant=cq,
        )

    def extract_features(self, frames: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(N, H, W, C) frames → (N, H, W, F) features (one batched dispatch)."""
        return self.feature_extractor(frames.astype(self.dtype), train)

    def align_to_center(
        self, nb: jnp.ndarray, ctr: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        """Flow-estimate + warp neighbour features onto center features."""
        flow = self.motion_estimator(nb, ctr, train)
        return ops.flow_warp(nb, flow)

    def fuse_from_features(
        self,
        aligned,
        center_feat: jnp.ndarray,
        center_lr: jnp.ndarray,
        train: bool = False,
        output_layout: str = "nhwc",
    ) -> jnp.ndarray:
        """Aligned feature list + center LR frame → SR frame.

        The shared tail of the batched and streaming paths: attention
        aggregation → RDB stack → global fusion + center skip → pre-shuffle
        residual + phase-channel bicubic base → one depth-to-space.

        ``output_layout`` selects the depth-to-space form (all exact, same
        bytes — see nerve_tpu.ops.pixel_shuffle):
          * 'nhwc'   — (B, sH, sW, C); the 3-lane minor dim costs ~10 ms of
                       XLA layout copies at 2160p. Default for API parity.
          * 'planar' — (B, C, sH, sW) channel-first (the reference's native
                       contract); clean layouts, ~0.1-0.5 ms. Serving choice.
          * 'packed' — (B, sH, sW·C) interleaved packed rows via the MXU
                       scatter-matmul kernel (~0.4 ms); for raw-byte
                       consumers (encoders, display buffers).
        """
        aggregated = self.temporal_aggregator(aligned, train)
        residual = self.rdbs(aggregated)
        fused = self.gff(residual, train) + center_feat

        # Epilogue in pre-shuffle phase-channel space: the bicubic base is
        # computed as s² phase channels (static shifted adds, no gathers) and
        # added to the upsampler conv's raw output, so the whole residual
        # epilogue performs exactly ONE depth-to-space interleave.
        hr_residual_ch = self.upsampler(fused, train)
        bicubic_ch = ops.upsample_bicubic_channels(
            center_lr.astype(self.dtype), self.scale_factor
        )
        # One cast to the serving dtype BEFORE the layout branch: every
        # layout returns the same values in the same dtype (a depth-to-space
        # is a pure permutation), so switching layouts never changes bytes.
        out_ch = jnp.clip(
            bicubic_ch.astype(jnp.float32) + hr_residual_ch.astype(jnp.float32),
            0.0, 1.0,
        ).astype(self.dtype)
        if output_layout == "planar":
            return ops.pixel_shuffle_planar(out_ch, self.scale_factor)
        if output_layout == "packed":
            return ops.depth_to_space_packed(out_ch, self.scale_factor)
        if output_layout != "nhwc":
            raise ValueError(f"unknown output_layout {output_layout!r}")
        return ops.pixel_shuffle(out_ch, self.scale_factor)

    def streaming_step(self, prev_feats, center_feat, next_feat,
                       center_lr: jnp.ndarray,
                       output_layout: str = "nhwc") -> jnp.ndarray:
        """One streaming-video step: cached neighbour features, new next frame.

        ``prev_feats``: list of the already-extracted features of frames
        t-w..t-1; ``next_feat``: features of frames t+1..t+w stacked flat
        (list). Only the NEW frame's features need extracting per step —
        a 3× saving on FeatureExtractor for the default window (see
        nerve_tpu.models.streaming).
        """
        nbs = list(prev_feats) + list(next_feat)
        nb = jnp.concatenate(nbs, axis=0)
        ctr = jnp.concatenate([center_feat] * len(nbs), axis=0)
        warped = self.align_to_center(nb, ctr)
        b = center_feat.shape[0]
        aligned = (
            [warped[i * b : (i + 1) * b] for i in range(len(prev_feats))]
            + [center_feat]
            + [warped[(len(prev_feats) + i) * b : (len(prev_feats) + i + 1) * b]
               for i in range(len(next_feat))]
        )
        return self.fuse_from_features(
            aligned, center_feat, center_lr, output_layout=output_layout
        )

    def __call__(
        self,
        lr_frames: jnp.ndarray,
        train: bool = False,
        return_intermediate: bool = False,
    ):
        b, t, h, w, c = lr_frames.shape
        if t != self.num_frames:
            raise ValueError(
                f"expected T={self.num_frames} frames (2*temporal_window+1), got {t}"
            )
        center = t // 2
        x = lr_frames.astype(self.dtype)

        # Feature extraction over all frames in one batch (replaces the
        # reference's per-frame loop at :346-349). Features stay flat
        # (B·T, H, W, F): 5-D slices of tiny T dims pick up pathological
        # TPU layouts (4× padding), flat row indexing does not.
        feats_flat = self.extract_features(x.reshape(b * t, h, w, c), train)

        center_rows = jnp.arange(b) * t + center
        center_feat = jnp.take(feats_flat, center_rows, axis=0)

        if t > 1:
            # All non-center frames flow-aligned to the center in one batch
            # (replaces the loop at :355-363).
            n = t - 1
            nb_rows = jnp.asarray(
                [bi * t + j for bi in range(b) for j in range(t) if j != center]
            )
            nb = jnp.take(feats_flat, nb_rows, axis=0)
            ctr = jnp.repeat(center_feat, n, axis=0)
            warped_flat = self.align_to_center(nb, ctr, train)  # (b·n, h, w, f)
            aligned = []
            for j in range(t):
                if j == center:
                    aligned.append(center_feat)
                else:
                    pos = j if j < center else j - 1
                    rows = jnp.arange(b) * n + pos
                    aligned.append(jnp.take(warped_flat, rows, axis=0))
        else:
            aligned = [center_feat]

        out = self.fuse_from_features(aligned, center_feat, lr_frames[:, center], train)
        if return_intermediate:
            # Parity with the reference's debug outputs (:384-389).
            return out, {
                "features": feats_flat.reshape(b, t, h, w, self.num_features),
                "aligned": jnp.stack(aligned, axis=1),
                "aggregated": self.temporal_aggregator(aligned, train),
            }
        return out


class LightweightSuperResolution(nn.Module):
    """Single-frame ultra-light SR. Parity: :434-470.

    Input (B, H, W, C); output in [0, 1] with layout per ``output_layout``
    (see SuperResolutionNet.fuse_from_features): 'nhwc' (B, sH, sW, C)
    default, 'planar' (B, C, sH, sW), 'packed' (B, sH, sW·C).
    """

    scale_factor: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, output_layout: str = "nhwc"
    ) -> jnp.ndarray:
        inp = x.astype(self.dtype)
        # Param tree identical to the former nn.Conv head/tail +
        # DepthwiseSeparableConv body — checkpoints and import_torch mappings
        # are unchanged; only the serving compute path differs.
        hk, hb = ConvParams(32, (3, 3), x.shape[-1], name="head")()
        body = [
            DepthwiseSeparableConv(32, dtype=self.dtype, name=f"body{i}")
            for i in range(4)
        ]
        tk, tb = ConvParams(
            3 * self.scale_factor**2, (3, 3), 32,
            kernel_init=nn.initializers.zeros_init(), name="tail",
        )()
        if train:
            # Live batch statistics require the module path per block.
            y = ops.conv_chain_apply(inp, [(hk, hb, "relu")], use_pallas=False)
            for blk in body:
                y = blk(y, True)
            y = ops.conv_chain_apply(y, [(tk, tb, "none")], use_pallas=False)
        else:
            # BN-folded whole-body chain via the XLA formulation. The fused
            # Pallas launch of this 10-layer chain was MEASURED 4× SLOWER on
            # v5e (52-61 ms/frame across tiles vs ~14 ms XLA, 2026-08-19,
            # docs/perf_notes.md round 3): at 32 channels the channels-on-
            # lanes layout uses 32/128 VPU lanes and pads matmuls to 64
            # lanes, so the depthwise taps waste ≥4× throughput while XLA
            # runs the same convs in a spatial-major layout. Fused conv
            # chains win at ≥64 channels (RDB, attention heads) — not here.
            probe = jnp.zeros((1, 1, 1, 32), self.dtype)  # body blocks are 32ch
            chain = [(hk, hb, "relu")]
            for blk in body:
                chain.extend(blk(probe, False, as_entries=True))
            chain.append((tk, tb, "none"))
            y = ops.conv_chain_apply(inp, chain, use_pallas=False)
        base_ch = ops.upsample_bicubic_channels(x, self.scale_factor)
        # Serving-dtype cast before the layout branch: all layouts return the
        # same bytes (see SuperResolutionNet.fuse_from_features).
        out_ch = jnp.clip(
            base_ch.astype(jnp.float32) + y.astype(jnp.float32), 0.0, 1.0
        ).astype(self.dtype)
        if output_layout == "planar":
            return ops.pixel_shuffle_planar(out_ch, self.scale_factor)
        if output_layout == "packed":
            return ops.depth_to_space_packed(out_ch, self.scale_factor)
        if output_layout != "nhwc":
            raise ValueError(f"unknown output_layout {output_layout!r}")
        return ops.pixel_shuffle(out_ch, self.scale_factor)


def estimate_sr_flops(
    input_hw: tuple[int, int] = (128, 128),
    num_features: int = 64,
    num_frames: int = 3,
    scale_factor: int = 2,
) -> int:
    """Coarse FLOPs estimate — parity with SuperResolutionNet.get_flops (:411-431)."""
    h, w = input_hw
    c = 3
    f = num_features
    flops = h * w * c * f * 9
    flops += h * w * f * 81 * (num_frames - 1)
    flops += h * w * f * f * 9 * 8
    flops += h * w * f * (c * scale_factor**2) * 9
    return flops
