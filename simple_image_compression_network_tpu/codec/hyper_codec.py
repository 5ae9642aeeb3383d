"""End-to-end bitstream codec for the (mean-)scale-hyperprior float models.

encode: x -> g_a -> y; h_a -> z; round(z) coded with the learned factorized
        CDFs; h_s(z_hat) -> (mu,) sigma; round(y - mu) coded with
        scale-binned Gaussian CDF tables (context = scale bin).
decode: z from bitstream -> (mu,) sigma -> y from bitstream -> g_s(y_hat).

The decoded y_hat/z_hat are exactly the encoder's rounded integers (rANS is
lossless), so encoder/decoder reconstructions match bit-for-bit given
deterministic synthesis.

Both codecs share one coding core (``_code``/``_decode``): the only model
differences are whether the prior predicts a mean and how the latent
symbols are centered.
"""

from __future__ import annotations

import functools
import struct
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.hyperprior import ScaleHyperprior
from . import container, device_rans, entropy, escape, ilrans, rans
from .int_codec import plan_streams, _pack_streams, _unpack_streams

_Z_MAX = 63    # hyper-latent support [-63, 63] + escape
_Y_MAX = 255   # latent support [-255, 255] + escape (host serial format)
_Y_MAX_DEV = 127  # device format: smaller alphabet keeps the VPU symbol
                  # search short; overflow -> escape + raw side section


def build_factorized_cdfs(model: ScaleHyperprior, params,
                          max_abs: int = _Z_MAX) -> np.ndarray:
    """Evaluate the learned per-channel density on the integer grid."""
    grid = jnp.arange(-max_abs, max_abs + 1, dtype=jnp.float32)
    grid = jnp.tile(grid[:, None], (1, model.n))
    pmf = np.asarray(model.apply(
        params, grid, method=lambda m, g: m.bottleneck.likelihood(g)))
    rows = []
    for ch in range(model.n):
        p = pmf[:, ch]
        overflow = max(1.0 - p.sum(), 0.0)
        rows.append(entropy.quantize_cdf(np.append(p, overflow)))
    return np.stack(rows)


def build_gaussian_cdfs(scale_table: np.ndarray,
                        max_abs: int = _Y_MAX) -> np.ndarray:
    return np.stack([entropy.gaussian_cdf_table(s, max_abs)
                     for s in scale_table])


def _code(vals: np.ndarray, ctx: np.ndarray, cdfs: np.ndarray,
          max_abs: int) -> bytes:
    """Center/clip integers to symbols with escape + raw side-channel."""
    syms = np.clip(vals, -max_abs, max_abs) + max_abs
    esc = cdfs.shape[1] - 2
    syms = np.where(np.abs(vals) > max_abs, esc, syms)
    return rans.encode(syms.ravel(), ctx.ravel(), cdfs, raw=vals.ravel())


def _decode(data: bytes, n: int, ctx: np.ndarray, cdfs: np.ndarray,
            max_abs: int) -> np.ndarray:
    syms, raw = rans.decode(data, n, ctx, cdfs)
    esc = cdfs.shape[1] - 2
    return np.where(syms == esc, raw, syms - max_abs)


# ---------------------------------------------------------------------------
# On-device entropy coding (ilrans format, escape/bypass side channel)
# ---------------------------------------------------------------------------


def _ctx_encode_impl(n_lanes: int, t_steps: int | None = None,
                     has_ctx: bool = False,
                     total_streams: int | None = None) -> str:
    """Engine for the device encode: the compact Pallas kernel on TPU for
    vector-aligned lane counts whose scratch fits VMEM
    (``pallas_rans.encode_vmem_ok``), else lax.scan.  SICN_RANS_IMPL
    overrides."""
    import os as _os
    forced = _os.environ.get("SICN_RANS_IMPL")
    if forced:
        return forced
    if jax.default_backend() == "tpu" and n_lanes % 128 == 0:
        if t_steps is not None:
            from . import pallas_rans
            g = (pallas_rans.pick_g(total_streams)
                 if total_streams else 8)
            if not pallas_rans.encode_vmem_ok(t_steps, n_lanes, has_ctx,
                                              g):
                return "scan"
        return "pallas"
    return "scan"


@functools.partial(jax.jit, static_argnames=("t_steps", "n_lanes",
                                             "n_streams", "max_abs",
                                             "impl", "cap"))
def _dev_encode(vals: jax.Array, ctx: jax.Array | None, cdfs: jax.Array, *,
                t_steps: int, n_lanes: int, n_streams: int, max_abs: int,
                impl: str = "scan", cap: int = 0):
    """(B, P, C) centered ints -> per-stream word buffers, on device.

    ctx: (B, P, C) int32 CDF-row indices (None = fixed per-lane rows,
    cdfs pre-gathered to (N, L+1)).  Returns (words u16, counts, escapes
    per image) — the only host fetches the caller needs.  With
    impl="pallas" the compact kernel caps payloads at ``cap`` words;
    callers must re-encode with impl="scan" when counts exceed it.
    """
    b = vals.shape[0]
    syms = escape.to_symbols(vals, max_abs)
    syms = syms.reshape(b * n_streams, t_steps, n_lanes)
    ctx_r = (None if ctx is None
             else ctx.reshape(b * n_streams, t_steps, n_lanes))
    if impl.startswith("pallas"):
        from . import pallas_rans
        words, counts = pallas_rans.encode_batch_compact(
            syms, cdfs, ctx_r, cap_words=cap,
            interpret=impl.endswith("interpret"))
    elif ctx_r is None:
        enc = jax.vmap(lambda s: device_rans.encode(s, cdfs, None))
        words, counts = enc(syms)
    else:
        enc = jax.vmap(lambda s, c: device_rans.encode(s, cdfs, c))
        words, counts = enc(syms, ctx_r)
    n_esc = jnp.sum(jnp.abs(vals.astype(jnp.int32)) > max_abs,
                    axis=tuple(range(1, vals.ndim)))
    return words.astype(jnp.uint16), counts, n_esc


def _ctx_decode_impl(n_lanes: int, cap: int,
                     t_steps: int | None = None,
                     total_streams: int | None = None) -> str:
    """Engine for per-symbol-context decode: Pallas kernel on TPU when
    lanes are vector-aligned and the words window AND the t-scaled
    ctx/symbol blocks fit VMEM, else lax.scan."""
    import os as _os
    forced = _os.environ.get("SICN_RANS_IMPL")
    if forced:
        return forced
    from . import pallas_rans
    if jax.default_backend() == "tpu" and n_lanes % 128 == 0:
        if t_steps is not None:
            g = (pallas_rans.pick_g(total_streams)
                 if total_streams else 8)
            if pallas_rans.decode_ctx_vmem_ok(t_steps, n_lanes, cap, g):
                return "pallas"
            return "scan"
        if cap <= pallas_rans.max_supported_cap(n_lanes):
            return "pallas"
    return "scan"


@functools.partial(jax.jit, static_argnames=("t_steps", "impl"))
def _dev_decode_ctx(words: jax.Array, true_counts: jax.Array,
                    cdfs: jax.Array, ctx: jax.Array, *, t_steps: int,
                    impl: str = "scan"):
    """Batched device decode with per-symbol contexts (Pallas or scan)."""
    if impl.startswith("pallas"):
        from . import pallas_rans
        x0 = pallas_rans.split_init(words, ctx.shape[-1])
        syms, consumed, x_fin = pallas_rans.decode_ctx(
            words, x0, cdfs, ctx, t_steps=t_steps,
            interpret=impl.endswith("interpret"))
    else:
        dec = jax.vmap(lambda w, c: device_rans.decode(w, cdfs, c,
                                                       t_steps=t_steps))
        syms, consumed, x_fin = dec(words.astype(jnp.uint32), ctx)
    ok = jnp.logical_and(consumed == true_counts,
                         jnp.all(x_fin == ilrans.STATE_LB, axis=1))
    return syms, ok


def _plan_lanes(n_pix: int, channels: int, lane_mult: int = 2,
                n_streams: int = 8) -> Tuple[int, int, int]:
    """-> (n_streams, n_lanes, t_steps) for a (P, C) channel-fastest latent."""
    s, lm = plan_streams(n_pix, lane_mult, n_streams)
    n_lanes = lm * channels
    return s, n_lanes, (n_pix // lm) // s


class HyperCodec:
    """Encoder/decoder pair sharing precomputed tables (scale prior)."""

    def __init__(self, model, params):
        self.model = model
        self.params = params
        self.scale_table = entropy.default_scale_table()
        self.z_cdfs = build_factorized_cdfs(model, params)
        self.y_cdfs = build_gaussian_cdfs(self.scale_table)
        self.y_cdfs_dev = build_gaussian_cdfs(self.scale_table, _Y_MAX_DEV)
        self._encode_arrays = jax.jit(
            lambda x: model.apply(params, x, method=model.encode_arrays))
        self._analysis_arrays = jax.jit(
            lambda x: model.apply(params, x, method=model.analysis_arrays))
        self._decode_arrays = jax.jit(
            lambda y: model.apply(params, y, method=model.decode_arrays))
        self._round = jax.jit(jnp.round)
        self._center = jax.jit(lambda y, mu: jnp.round(y - mu))
        if hasattr(model, "scales_from_z"):  # MeanScale uses params_from_z
            self._scales_from_z = jax.jit(
                lambda z: model.apply(params, z, method=model.scales_from_z))
        # predicted bucketed word widths for the pipelined submit-time
        # fetch (see PipelinedEncoder) — learned from each batch's counts
        self._mxb_z: Optional[int] = None
        self._mxb_y: Optional[int] = None

    # --- model-specific hooks -------------------------------------------
    def _encode_parts(self, x) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """-> (centered integer latent symbols, integer z, sigma).

        mu/sigma come from ``_prior_from_z`` on the QUANTIZED z_hat — the
        decoder's own jitted program — so the scale-bin contexts agree
        bitwise with decode (ADVICE r3)."""
        y, z_hat = self._analysis_arrays(x)
        mu, sigma = self._prior_from_z(z_hat)
        ysym = self._round(y) if mu is None else self._center(y, mu)
        return (np.asarray(ysym, np.int32), np.asarray(z_hat, np.int32),
                np.asarray(sigma))

    def _prior_from_z(self, z_hat) -> Tuple[Optional[jax.Array], np.ndarray]:
        """-> (mu or None, sigma) predicted from the decoded hyper-latent."""
        return None, np.asarray(self._scales_from_z(z_hat))

    # --- shared coding core ---------------------------------------------
    def compress(self, x: jax.Array) -> bytes:
        assert x.shape[1] % 64 == 0 and x.shape[2] % 64 == 0, (
            "hyperprior codecs need image dims divisible by 64 (16x "
            "analysis downsample, 4x hyper stage); pad with edge values")
        y, z, sigma = self._encode_parts(x)
        n, zx, zy, zc = z.shape
        assert n == 1
        z_ctx = np.broadcast_to(np.arange(zc, dtype=np.int32),
                                z.reshape(-1, zc).shape)
        z_bytes = _code(z.reshape(-1, zc), z_ctx, self.z_cdfs, _Z_MAX)
        idx = entropy.scale_to_index(sigma.ravel(), self.scale_table)
        y_bytes = _code(y.ravel(), idx, self.y_cdfs, _Y_MAX)
        header = struct.pack("<HHHHHH", x.shape[1], x.shape[2], zx, zy, zc,
                             y.shape[3])
        return container.pack(container.CODEC_HYPERPRIOR,
                              [header, z_bytes, y_bytes])

    def decompress(self, data: bytes) -> Tuple[jax.Array, jax.Array]:
        codec_id, (header, z_bytes, y_bytes) = container.unpack(data)
        assert codec_id == container.CODEC_HYPERPRIOR
        ix, iy, zx, zy, zc, yc = struct.unpack("<HHHHHH", header)
        z_ctx = np.broadcast_to(np.arange(zc, dtype=np.int32),
                                (zx * zy, zc)).ravel()
        z = _decode(z_bytes, zx * zy * zc, z_ctx, self.z_cdfs, _Z_MAX)
        z_hat = jnp.asarray(z.reshape(1, zx, zy, zc), jnp.float32)
        mu, sigma = self._prior_from_z(z_hat)
        idx = entropy.scale_to_index(sigma.ravel(), self.scale_table)
        y = _decode(y_bytes, sigma.size, idx, self.y_cdfs, _Y_MAX)
        y_hat = jnp.asarray(y.reshape(sigma.shape), jnp.float32)
        if mu is not None:
            y_hat = y_hat + mu
        x_hat = self._decode_arrays(y_hat)
        return x_hat, y_hat

    def stats(self, x_shape, data: bytes) -> Dict[str, float]:
        n_pixels = x_shape[1] * x_shape[2]
        return {"bytes": len(data), "bpp": 8.0 * len(data) / n_pixels}

    # --- device-format batch codec (zero host coding in the hot path) ----
    def _encode_dev_arrays(self, x) -> Tuple[jax.Array, jax.Array,
                                             Optional[jax.Array], jax.Array]:
        """-> device (centered y symbols f32, z f32, mu|None, sigma).

        mu/sigma are recomputed from the quantized z_hat with the SAME
        jitted program the decoder uses (``_prior_from_z_dev``), not the
        fused encode program's outputs: two XLA programs for the h_s
        float convs are not guaranteed ulp-identical, and a one-ulp
        sigma difference on a scale-bin boundary would desync the y
        stream (ADVICE r3)."""
        y, z_hat = self._analysis_arrays(x)
        mu, sigma = self._prior_from_z_dev(z_hat)
        ysym = self._round(y) if mu is None else self._center(y, mu)
        return ysym, z_hat, mu, sigma

    def _prior_from_z_dev(self, z_hat) -> Tuple[Optional[jax.Array],
                                                jax.Array]:
        return None, self._scales_from_z(z_hat)

    def _scale_ctx(self, sigma: jax.Array) -> jax.Array:
        """Per-latent scale-bin context, computed ON DEVICE (both sides
        derive it from the same decoded z_hat, so they agree bitwise).

        searchsorted(table, s, 'left') == #{k: table[k] < s}, computed
        as a broadcast compare + sum over the 64 bins: XLA's
        ``jnp.searchsorted`` lowering cost ~132 ms/batch on TPU — 90% of
        the whole hyper encode's device time (round-4 k-slope); the
        compare-sum form is sub-ms and bin-for-bin identical."""
        table = jnp.asarray(self.scale_table, jnp.float32)
        s = sigma.astype(jnp.float32)
        idx = jnp.sum((table < s[..., None]).astype(jnp.int32), axis=-1)
        return jnp.clip(idx, 0, len(self.scale_table) - 1).astype(jnp.int32)

    def compress_batch(self, x: jax.Array) -> List[bytes]:
        """(B, X, Y, 3) [0,1] images -> B device-format containers.

        One batched device pass for the transforms and one per latent
        tensor for the entropy stage; the hyper-latent z codes with fixed
        per-lane factorized rows, the latent y with scale-bin contexts
        gathered per step.  Out-of-alphabet values escape to a raw side
        section (``codec/escape.py``); host work is container packing only.
        """
        return self._compress_drain(self._compress_schedule(x))

    def _compress_schedule(self, x: jax.Array) -> Tuple:
        """Enqueue all device work for one batch; no host round trips.

        Returns an opaque state consumed by ``_compress_drain`` — the
        split lets a serving pipeline overlap batch k's fetch/pack with
        batch k+1's device compute (``HyperPipelinedEncoder``).
        """
        assert x.shape[1] % 64 == 0 and x.shape[2] % 64 == 0, (
            "hyperprior codecs need image dims divisible by 64")
        ysym_f, z_f, _mu, sigma = self._encode_dev_arrays(x)
        y = ysym_f.astype(jnp.int32)
        z = z_f.astype(jnp.int32)
        b, yx, yy, yc = y.shape
        _, zx, zy, zc = z.shape
        s_z, nl_z, t_z = _plan_lanes(zx * zy, zc)
        s_y, nl_y, t_y = _plan_lanes(yx * yy, yc)
        z_lane_cdf = self._dev_table(("z_lane", nl_z, zc),
                                     lambda: self.z_cdfs[
                                         np.arange(nl_z) % zc])
        y_cdfs = self._dev_table(("y_cdfs",), lambda: self.y_cdfs_dev)
        ctx_y = self._scale_ctx(sigma)

        from . import pallas_rans

        def encode_tensor(vals, ctx, cdfs, t_steps, n_lanes, n_streams,
                          max_abs):
            impl = _ctx_encode_impl(n_lanes, t_steps, ctx is not None,
                                    b * n_streams)
            cap = (pallas_rans.default_encode_cap(t_steps, n_lanes)
                   if impl.startswith("pallas") else 0)
            w, cnt, esc = _dev_encode(
                vals, ctx, cdfs, t_steps=t_steps, n_lanes=n_lanes,
                n_streams=n_streams, max_abs=max_abs, impl=impl, cap=cap)
            return w, cnt, esc, impl, cap

        zw, zcnt, z_esc, z_impl, z_cap = encode_tensor(
            z.reshape(b, zx * zy, zc), None, z_lane_cdf, t_z, nl_z, s_z,
            _Z_MAX)
        yw, ycnt, y_esc, y_impl, y_cap = encode_tensor(
            y.reshape(b, yx * yy, yc), ctx_y.reshape(b, yx * yy, yc),
            y_cdfs, t_y, nl_y, s_y, _Y_MAX_DEV)
        # ONE combined fetch buffer per batch: counts + escape totals +
        # both (predictively bucketed) word payloads as a single u16
        # vector.  Every separate device->host await over the tunneled
        # link costs a full RTT (~40-70 ms) REGARDLESS of
        # copy_to_host_async (the transfer only happens at the await),
        # so the round-3 three-fetch drain paid ~3 RTTs per batch; this
        # pays one.  The slice + concat are dispatched NOW so they run
        # ahead of the next batch's compute in the device queue.
        meta = jnp.concatenate([
            zcnt.astype(jnp.int32), ycnt.astype(jnp.int32),
            z_esc.astype(jnp.int32), y_esc.astype(jnp.int32)])
        zw_s = self._presliced(zw, self._mxb_z)
        yw_s = self._presliced(yw, self._mxb_y)
        fetch = jnp.concatenate([
            (meta & 0xFFFF).astype(jnp.uint16),
            ((meta >> 16) & 0xFFFF).astype(jnp.uint16),
            zw_s.reshape(-1), yw_s.reshape(-1)])
        fetch.copy_to_host_async()
        shapes = (x.shape[1], x.shape[2], b, zx, zy, zc, yx, yy, yc,
                  s_z, nl_z, t_z, s_y, nl_y, t_y)
        widths = (zw_s.shape[1], yw_s.shape[1])
        return (shapes, widths, z, y, ctx_y, z_lane_cdf, y_cdfs, fetch,
                zw, z_impl, z_cap, yw, y_impl, y_cap)

    def _dev_table(self, key: Tuple, build) -> jax.Array:
        """Device-resident CDF table, uploaded once per codec instance
        and geometry (round 3 re-uploaded tables every batch)."""
        cache = getattr(self, "_table_cache", None)
        if cache is None:
            cache = self._table_cache = {}
        if key not in cache:
            cache[key] = jnp.asarray(build())
        return cache[key]

    @staticmethod
    def _presliced(words: jax.Array, mxb: Optional[int]) -> jax.Array:
        """Bucketed slice at the PREDICTED width."""
        return (words if mxb is None or mxb >= words.shape[1]
                else words[:, :mxb])

    def _compress_drain(self, state: Tuple) -> List[bytes]:
        """Fetch + pack a scheduled batch's containers (host side)."""
        (shapes, widths, z, y, ctx_y, z_lane_cdf, y_cdfs, fetch,
         zw, z_impl, z_cap, yw, y_impl, y_cap) = state
        (ix, iy, b, zx, zy, zc, yx, yy, yc,
         s_z, nl_z, t_z, s_y, nl_y, t_y) = shapes
        w_z, w_y = widths
        buf = np.asarray(fetch)
        m = b * (s_z + s_y) + 2 * b
        meta_np = (buf[:m].astype(np.int32)
                   | (buf[m: 2 * m].astype(np.int32) << 16))
        zcnt_np = meta_np[: b * s_z]
        ycnt_np = meta_np[b * s_z: b * (s_z + s_y)]
        z_esc_np = meta_np[b * (s_z + s_y): b * (s_z + s_y) + b]
        y_esc_np = meta_np[b * (s_z + s_y) + b:]
        zw_np = buf[2 * m: 2 * m + b * s_z * w_z].reshape(b * s_z, w_z)
        yw_np = buf[2 * m + b * s_z * w_z:].reshape(b * s_y, w_y)
        # rare overflow of the compact kernel's staging cap: re-encode on
        # the unbounded scan engine (blocking, individually fetched)
        if z_impl.startswith("pallas") and zcnt_np.max() > 2 * nl_z + z_cap:
            zw, zcnt, _ = _dev_encode(
                z.reshape(b, zx * zy, zc), None, z_lane_cdf, t_steps=t_z,
                n_lanes=nl_z, n_streams=s_z, max_abs=_Z_MAX, impl="scan")
            zcnt_np, zw_np = np.asarray(zcnt), None
        if y_impl.startswith("pallas") and ycnt_np.max() > 2 * nl_y + y_cap:
            yw, ycnt, _ = _dev_encode(
                y.reshape(b, yx * yy, yc), ctx_y.reshape(b, yx * yy, yc),
                y_cdfs, t_steps=t_y, n_lanes=nl_y, n_streams=s_y,
                max_abs=_Y_MAX_DEV, impl="scan")
            ycnt_np, yw_np = np.asarray(ycnt), None

        def refetch(full, got, counts_np):
            """Re-fetch when the predictive bucket was too narrow (or a
            scan re-encode replaced the buffer)."""
            need = min(device_rans.bucket_words(int(counts_np.max())),
                       full.shape[1])
            if got is None or need > got.shape[1]:
                got = np.asarray(full[:, :need]
                                 if need < full.shape[1] else full)
            return got, need

        zw_np, self._mxb_z = refetch(zw, zw_np, zcnt_np)
        yw_np, self._mxb_y = refetch(yw, yw_np, ycnt_np)
        z_chunks = device_rans.streams_from_words(
            zw_np, zcnt_np, t_z * nl_z, nl_z)
        y_chunks = device_rans.streams_from_words(
            yw_np, ycnt_np, t_y * nl_y, nl_y)
        # escapes are the tables' ~2^-16 overflow mass: fetch raw values
        # only for images that actually have any
        z_np = np.asarray(z) if z_esc_np.any() else None
        y_np = np.asarray(y) if y_esc_np.any() else None

        header = struct.pack("<HHHHHHHH", ix, iy, zx, zy, zc, yx, yy, yc)
        out = []
        for i in range(b):
            z_raw = escape.pack_raw(
                z_np[i] if z_np is not None else np.zeros(0), _Z_MAX)
            y_raw = escape.pack_raw(
                y_np[i] if y_np is not None else np.zeros(0), _Y_MAX_DEV)
            out.append(container.pack(container.CODEC_HYPERPRIOR_DEV, [
                header,
                _pack_streams(z_chunks[i * s_z: (i + 1) * s_z]),
                _pack_streams(y_chunks[i * s_y: (i + 1) * s_y]),
                z_raw, y_raw]))
        return out

    def decompress_batch(self, blobs: Sequence[bytes]
                         ) -> Tuple[jax.Array, jax.Array]:
        """B device-format containers -> (x_hat, y_hat), decoded on device."""
        return self._decompress_drain(self._decompress_schedule(blobs))

    def _decompress_drain(self, state: Tuple
                          ) -> Tuple[jax.Array, jax.Array]:
        """Validity fetch for a scheduled batch (one round trip)."""
        x_hat, y_hat, ok_dev, nz = state
        ok = np.asarray(ok_dev)
        if not ok[:nz].all():
            raise ValueError("corrupt hyper-latent stream")
        if not ok[nz:].all():
            raise ValueError("corrupt latent stream")
        return x_hat, y_hat

    def _decompress_schedule(self, blobs: Sequence[bytes]) -> Tuple:
        """Enqueue all device decode work; host work is byte unpacking
        (plus escape patching for the rare containers that carry raws)."""
        from . import int_codec
        metas = []
        for data in blobs:
            cid, (hdr, z_pay, y_pay, z_raw, y_raw) = container.unpack(data)
            assert cid == container.CODEC_HYPERPRIOR_DEV
            metas.append((struct.unpack("<HHHHHHHH", hdr),
                          _unpack_streams(z_pay), _unpack_streams(y_pay),
                          z_raw, y_raw))
        assert all(m[0] == metas[0][0] for m in metas), "mixed geometries"
        (ix, iy, zx, zy, zc, yx, yy, yc) = metas[0][0]
        b = len(blobs)
        s_z, nl_z, t_z = _plan_lanes(zx * zy, zc)
        s_y, nl_y, t_y = _plan_lanes(yx * yy, yc)

        def gather_np(chunk_lists):
            off = ilrans.unpack_header(chunk_lists[0][0])[3]
            counts = np.asarray([(len(ch) - off) // 2
                                 for chs in chunk_lists for ch in chs],
                                np.int32)
            cap = device_rans.bucket_words(int(counts.max()))
            words = np.stack([device_rans.words_from_bytes(ch[off:], cap)
                              for chs in chunk_lists for ch in chs])
            return words, counts, cap

        # ONE combined host->device upload for both tensors' words +
        # counts (each separate transfer over the tunneled link pays a
        # full RTT; round 3 paid four), split by cheap device slices
        zw_np, zc_np, z_cap = gather_np([m[1] for m in metas])
        yw_np, yc_np, y_cap = gather_np([m[2] for m in metas])
        up = jnp.asarray(np.concatenate([
            (zc_np & 0xFFFF).astype(np.uint16),
            (zc_np >> 16).astype(np.uint16),
            (yc_np & 0xFFFF).astype(np.uint16),
            (yc_np >> 16).astype(np.uint16),
            zw_np.reshape(-1), yw_np.reshape(-1)]))
        nz, ny = zc_np.size, yc_np.size
        z_counts = (up[:nz].astype(jnp.int32)
                    | (up[nz: 2 * nz].astype(jnp.int32) << 16))
        y_counts = (up[2 * nz: 2 * nz + ny].astype(jnp.int32)
                    | (up[2 * nz + ny: 2 * (nz + ny)].astype(jnp.int32)
                       << 16))
        o = 2 * (nz + ny)
        z_words = up[o: o + zw_np.size].reshape(zw_np.shape)
        y_words = up[o + zw_np.size:].reshape(yw_np.shape)

        # hyper-latent: fixed per-lane rows -> int8-codec decode machinery
        # (Pallas VPU kernel when eligible)
        z_lane_cdf = self._dev_table(("z_lane", nl_z, zc),
                                     lambda: self.z_cdfs[
                                         np.arange(nl_z) % zc])
        z_syms, z_ok = int_codec._device_decode_batch(
            z_words.astype(jnp.uint16), z_counts, z_lane_cdf, t_steps=t_z,
            impl=int_codec._decode_impl(nl_z, z_cap,
                                        int(z_words.shape[0])))
        # validity is checked ONCE for both tensors at the end: the y
        # decode needs only device-resident z_hat, so no host round trip
        # has to sit between the two stages
        z_vals = z_syms.astype(jnp.int32).reshape(b, zx, zy, zc) - _Z_MAX
        if any(escape.unpack_raw(m[3])[0].size for m in metas):
            zs = np.asarray(z_vals) + _Z_MAX  # back to symbol space
            z_list = []
            for i, m in enumerate(metas):
                raw, _ = escape.unpack_raw(m[3])
                z_list.append(escape.from_symbols(zs[i], raw, _Z_MAX)
                              .reshape(zx, zy, zc))
            z_vals = jnp.asarray(np.stack(z_list), jnp.int32)
        z_hat = z_vals.astype(jnp.float32)

        mu, sigma = self._prior_from_z_dev(z_hat)
        ctx_y = self._scale_ctx(sigma).reshape(b * s_y, t_y, nl_y)
        y_syms, y_ok = _dev_decode_ctx(
            y_words, y_counts, self._dev_table(("y_cdfs",),
                                               lambda: self.y_cdfs_dev),
            ctx_y, t_steps=t_y,
            impl=_ctx_decode_impl(nl_y, y_cap, t_y, b * s_y))
        y_vals = (y_syms.astype(jnp.int32).reshape(b, yx, yy, yc)
                  - _Y_MAX_DEV)
        if any(escape.unpack_raw(m[4])[0].size for m in metas):
            ys = np.asarray(y_vals) + _Y_MAX_DEV
            y_list = []
            for i, m in enumerate(metas):
                raw, _ = escape.unpack_raw(m[4])
                y_list.append(escape.from_symbols(ys[i], raw, _Y_MAX_DEV)
                              .reshape(yx, yy, yc))
            y_vals = jnp.asarray(np.stack(y_list), jnp.int32)
        y_hat = y_vals.astype(jnp.float32)
        if mu is not None:
            y_hat = y_hat + mu
        x_hat = self._decode_arrays(y_hat)
        # the validity vector is concatenated + its host copy started
        # HERE (schedule time) so the pipelined drain's await finds it
        # already local instead of queueing the concat behind the next
        # batch's device work
        ok_dev = jnp.concatenate([z_ok.ravel(), y_ok.ravel()])
        ok_dev.copy_to_host_async()
        return x_hat, y_hat, ok_dev, z_ok.size


class MeanScaleCodec(HyperCodec):
    """Codec for MeanScaleHyperprior: symbols are round(y - mu) (zero-mean),
    reconstruction adds mu back before synthesis."""

    def __init__(self, model, params):
        super().__init__(model, params)
        self._params_from_z = jax.jit(
            lambda z: model.apply(params, z, method=model.params_from_z))

    def _prior_from_z(self, z_hat):
        mu, sigma = self._params_from_z(z_hat)
        return mu, np.asarray(sigma)

    def _prior_from_z_dev(self, z_hat):
        return self._params_from_z(z_hat)
