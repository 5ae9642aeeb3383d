"""End-to-end bitstream codec for the flagship bit-exact integer model.

encode: images -> integer analysis transform (bit-exact, TPU) -> int8 latent
        (values 0..127) -> N-lane interleaved rANS (``codec/ilrans.py``),
        coded ON DEVICE (``codec/device_rans.py``) or by the native C++
        coder -> container bytes (one stream per image, one device pass per
        batch).
decode: container bytes -> interleaved rANS decode (exact latent) -> integer
        synthesis transform -> reconstruction, bit-exact with running the
        autoencoder directly (the reference's correctness bar,
        conv3_nonsquare_tb.cpp:1068-1123, extended through a real bitstream).

Latent layout: (zx*zy, C) channel-fastest, lane = flat_index % (m*C), so
every rANS lane's context (its channel) is FIXED — the on-device decoder
needs no CDF gathers.  Each image is additionally split into S independent
spatial streams (contiguous pixel-row chunks of the latent): S*N_lanes
symbols decode in parallel per step, cutting the sequential scan depth S×,
and each stream is independently decodable — the unit of multi-chip entropy
sharding (SURVEY §2.5 FIFO row).  The reference's 4:1 fixed bottleneck
becomes ~4/(8/H):1 where H is the latent entropy in bits.
"""

from __future__ import annotations

import functools
import os
import struct
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, REFERENCE_NET, reference_net_for_input
from ..models import codec_int
from . import container, device_rans, entropy, ilrans, rans

_MAX_SYM = 128  # latent values are post-ReLU int8: 0..127
_L = _MAX_SYM + 1  # + escape bucket (never used for in-range data)
DEFAULT_LANE_MULT = 2   # lanes = mult * channels
DEFAULT_STREAMS = 8     # independent spatial streams per image

# per-geometry predicted bucketed word widths for the sync path's
# single-fetch (see compress_batch; the pipelined encoder keeps its own)
_SYNC_MXB: Dict[Tuple[int, int, int, int], int] = {}


def plan_streams(n_pix: int, lane_mult: int = DEFAULT_LANE_MULT,
                 n_streams: int = DEFAULT_STREAMS) -> Tuple[int, int]:
    """Pick (S, lane_mult) dividing the zx*zy latent pixels evenly.

    Prefers the requested values; degrades to the largest divisor of the
    per-stream step count so tiny images still code, and caps S so each
    stream keeps >= 32 steps (the 4 bytes/lane state flush would otherwise
    dominate small latents).  The choice is recorded in the bitstream
    (per-stream headers + stream count), so the decoder never re-derives it.
    """
    while n_pix % lane_mult:
        lane_mult -= 1
    t_total = n_pix // lane_mult
    s = max(1, min(n_streams, t_total // 32))
    while t_total % s:
        s -= 1
    return s, lane_mult


@functools.lru_cache(maxsize=None)
def _jit_analysis(cfg: ModelConfig):
    """Compiled analysis transform, cached per topology.

    Eager (op-by-op) execution of the 8-layer stack dispatches hundreds of
    ops individually — over a tunneled TPU that is seconds-to-minutes; the
    compiled step is milliseconds."""
    return jax.jit(lambda p, x: codec_int.analysis_int8(p, x, cfg))


@functools.lru_cache(maxsize=None)
def _jit_synthesis(cfg: ModelConfig):
    return jax.jit(lambda p, z: codec_int.synthesis_int8(p, z, cfg))


def _histogram_cdfs(z: np.ndarray) -> np.ndarray:
    """Per-channel histogram -> quantized CDF rows (C, L+1)."""
    c = z.shape[-1]
    flat = z.reshape(-1, c)
    rows = []
    for ch in range(c):
        counts = np.bincount(flat[:, ch].astype(np.int64),
                             minlength=_MAX_SYM).astype(np.float64)
        pmf = counts / max(counts.sum(), 1.0)
        rows.append(entropy.quantize_cdf(np.append(pmf, 0.0)))
    return np.stack(rows)


def _serialize_cdfs(cdfs: np.ndarray) -> bytes:
    # store the pmf frequencies as u16 (last row entry 2^16 is implicit)
    freqs = np.diff(cdfs, axis=1).astype(np.int64)
    # frequencies sum to 2^16 per row; u16 with 65536 stored as 0 is
    # unambiguous only if no other freq is 0 — quantize_cdf guarantees >=1.
    return freqs.astype("<u2").tobytes()


def _deserialize_cdfs(data: bytes, channels: int) -> np.ndarray:
    freqs = np.frombuffer(data, "<u2").astype(np.int64).reshape(channels, _L)
    freqs[freqs == 0] = 1 << 16
    cdfs = np.zeros((channels, _L + 1), np.int64)
    cdfs[:, 1:] = np.cumsum(freqs, axis=1)
    return cdfs.astype(np.int32)


def build_static_cdfs(params: Dict[str, jax.Array], images,
                      cfg: ModelConfig = REFERENCE_NET) -> np.ndarray:
    """Fit per-channel latent CDFs on sample images (shipped with the model,
    so bitstreams carry no tables)."""
    fa = _jit_analysis(cfg)
    zs = [np.asarray(fa(params, x)) for x in images]
    z = np.concatenate([a.reshape(-1, a.shape[-1]) for a in zs], axis=0)
    return _histogram_cdfs(z[None])


def _pick_coder(coder: str) -> str:
    if coder != "auto":
        return coder
    return "device" if jax.default_backend() == "tpu" else "native"


def _lane_cdf(cdfs: np.ndarray, n_lanes: int) -> np.ndarray:
    """(C, L+1) context CDFs -> per-lane rows (lane k <-> channel k % C)."""
    c = cdfs.shape[0]
    return cdfs[np.arange(n_lanes) % c]


def _encode_impl(n_lanes: int, t_steps: int | None = None,
                 total_streams: int | None = None) -> str:
    """Pick the device encode engine (mirror of ``_decode_impl``): the
    Pallas kernel on TPU for vector-aligned lane counts whose scratch
    fits VMEM (``pallas_rans.encode_vmem_ok`` at the ACTUAL stream-group
    size — odd stream counts force bigger blocks, ``pick_g``), else
    lax.scan.  SICN_RANS_IMPL=scan|pallas overrides."""
    forced = os.environ.get("SICN_RANS_IMPL")
    if forced:
        return forced
    if jax.default_backend() == "tpu" and n_lanes % 128 == 0:
        if t_steps is not None:
            from . import pallas_rans
            g = (pallas_rans.pick_g(total_streams)
                 if total_streams else 8)
            if not pallas_rans.encode_vmem_ok(t_steps, n_lanes, False, g):
                return "scan"
        return "pallas"
    return "scan"


@functools.partial(jax.jit,
                   static_argnames=("t_steps", "n_lanes", "n_streams"))
def _device_encode_scan(z: jax.Array, lane_cdf: jax.Array, *,
                        t_steps: int, n_lanes: int, n_streams: int):
    b = z.shape[0]
    syms = z.astype(jnp.int32).reshape(b * n_streams, t_steps, n_lanes)
    enc = jax.vmap(lambda s: device_rans.encode(s, lane_cdf, None))
    words, counts = enc(syms)
    return words.astype(jnp.uint16), counts


@functools.partial(jax.jit,
                   static_argnames=("t_steps", "n_lanes", "n_streams",
                                    "cap", "interpret"))
def _device_encode_pallas(z: jax.Array, lane_cdf: jax.Array, *,
                          t_steps: int, n_lanes: int, n_streams: int,
                          cap: int, interpret: bool = False):
    from . import pallas_rans
    b = z.shape[0]
    syms = z.astype(jnp.int32).reshape(b * n_streams, t_steps, n_lanes)
    words, counts = pallas_rans.encode_batch_compact(
        syms, lane_cdf, cap_words=cap, interpret=interpret)
    return words.astype(jnp.uint16), counts


def _encode_capacity(t_steps: int, n_lanes: int,
                     total_streams: int | None = None) -> int | None:
    """Max valid stream word count of the compact Pallas encoder, or None
    when the scan engine (no capacity bound) is in use."""
    if _encode_impl(n_lanes, t_steps, total_streams).startswith("pallas"):
        from . import pallas_rans
        return 2 * n_lanes + pallas_rans.default_encode_cap(t_steps,
                                                            n_lanes)
    return None


def _device_encode_batch(z: jax.Array, lane_cdf: jax.Array, *,
                         t_steps: int, n_lanes: int, n_streams: int):
    """(B, zx, zy, C) int8 latents -> (B*S) word streams on device.

    Words come back as u16 (the wire width) to halve the device->host
    fetch.  The encode engine is the Pallas kernel with in-kernel stream
    compaction when eligible (``_encode_impl``).  NOTE: the compact
    kernel bounds payloads by ``_encode_capacity``; callers that fetch
    counts must re-encode via ``_device_encode_scan`` when any count
    exceeds it (incompressible content — counts stay correct, payload
    bytes past the cap are dropped).  No host sync happens here, so the
    hot path stays a single device program."""
    impl = _encode_impl(n_lanes, t_steps, z.shape[0] * n_streams)
    if impl.startswith("pallas"):
        from . import pallas_rans
        cap = pallas_rans.default_encode_cap(t_steps, n_lanes)
        return _device_encode_pallas(
            z, lane_cdf, t_steps=t_steps, n_lanes=n_lanes,
            n_streams=n_streams, cap=cap,
            interpret=impl.endswith("interpret"))
    return _device_encode_scan(z, lane_cdf, t_steps=t_steps,
                               n_lanes=n_lanes, n_streams=n_streams)


def _decode_impl(n_lanes: int, cap: int | None = None,
                 n_streams: int | None = None) -> str:
    """Pick the device decode engine: the Pallas VPU kernel on TPU when
    the lane count is vector-register aligned and the word buffer fits the
    kernel's VMEM window, else the lax.scan form (bit-identical).
    ``n_streams`` (total stream count) sizes the words block's group
    width: pick_g returns a whole-array group for counts not divisible
    by 8, shrinking the admissible cap.  SICN_RANS_IMPL=scan|pallas
    overrides."""
    forced = os.environ.get("SICN_RANS_IMPL")
    if forced:
        return forced
    if jax.default_backend() == "tpu" and n_lanes % 128 == 0:
        from . import pallas_rans
        g = pallas_rans.pick_g(n_streams) if n_streams else 8
        if cap is not None and cap > pallas_rans.max_supported_cap(
                n_lanes, g):
            return "scan"  # over-wide buffer: VMEM window would not compile
        return "pallas"
    return "scan"


@functools.partial(jax.jit, static_argnames=("t_steps", "impl"))
def _device_decode_batch(words: jax.Array, true_counts: jax.Array,
                         lane_cdf: jax.Array, *, t_steps: int,
                         impl: str = "scan"):
    """(B*S, cap) u16 words -> (syms (B*S, t, N) int8, per-stream ok)."""
    if impl.startswith("pallas"):
        from . import pallas_rans
        x0 = pallas_rans.split_init(words, lane_cdf.shape[0])
        syms, consumed, x_fin = pallas_rans.decode(
            words, x0, lane_cdf, t_steps=t_steps,
            interpret=impl.endswith("interpret"))
        ok = jnp.logical_and(consumed == true_counts,
                             jnp.all(x_fin == ilrans.STATE_LB, axis=1))
        return syms, ok
    dec = jax.vmap(lambda w: device_rans.decode(w, lane_cdf, None,
                                                t_steps=t_steps))
    syms, consumed, x_fin = dec(words)
    ok = jnp.logical_and(consumed == true_counts,
                         jnp.all(x_fin == ilrans.STATE_LB, axis=1))
    return syms.astype(jnp.int8), ok


def _pack_streams(streams: Sequence[bytes]) -> bytes:
    """S per-chunk ilrans streams -> one payload section."""
    return struct.pack("<H", len(streams)) + b"".join(
        struct.pack("<I", len(s)) + s for s in streams)


def _unpack_streams(payload: bytes) -> List[bytes]:
    (s,) = struct.unpack_from("<H", payload)
    out, off = [], 2
    for _ in range(s):
        (ln,) = struct.unpack_from("<I", payload, off)
        out.append(payload[off + 4: off + 4 + ln])
        off += 4 + ln
    return out


def compress_batch(params: Dict[str, jax.Array], x: jax.Array,
                   cfg: ModelConfig = REFERENCE_NET,
                   static_cdfs: np.ndarray | None = None,
                   coder: str = "auto",
                   lane_mult: int = DEFAULT_LANE_MULT,
                   n_streams: int = DEFAULT_STREAMS) -> List[bytes]:
    """x: (B, X, Y, 3) int8/uint8 wire images -> B container bytestrings.

    One batched device pass for the transform and (coder="device") one for
    the entropy stage, vmapped over all B*S spatial streams.  With
    ``static_cdfs`` (from ``build_static_cdfs``) the tables are not
    embedded; otherwise per-image histograms are built and serialized
    (2*C*L bytes of overhead per image).
    """
    coder = _pick_coder(coder)
    z_dev = _jit_analysis(cfg)(params, x)
    b, zx, zy, c = z_dev.shape
    s, lane_mult = plan_streams(zx * zy, lane_mult, n_streams)
    n_lanes = lane_mult * c
    t_steps = (zx * zy) // lane_mult // s
    n_syms = t_steps * n_lanes  # per stream
    header = struct.pack("<HHHHH", x.shape[1], x.shape[2], zx, zy, c)

    if static_cdfs is not None:
        per_image_cdfs = [static_cdfs] * b
        cdf_sections = [b""] * b
    else:
        z_np = np.asarray(z_dev)
        per_image_cdfs = [_histogram_cdfs(z_np[i:i + 1]) for i in range(b)]
        cdf_sections = [_serialize_cdfs(cd) for cd in per_image_cdfs]

    out: List[bytes] = []
    if coder == "device" and static_cdfs is not None:
        lane_cdf = jnp.asarray(_lane_cdf(static_cdfs, n_lanes))
        words, counts = _device_encode_batch(
            z_dev, lane_cdf, t_steps=t_steps, n_lanes=n_lanes, n_streams=s)
        # ONE combined fetch (counts as u16 halves + payload bucketed at
        # the width PREDICTED from the last batch of this geometry):
        # every separate device->host await over the tunneled link costs
        # a full RTT, so the round-3 counts-then-words pattern paid two.
        key = (b, s, t_steps, n_lanes)
        mxb = min(_SYNC_MXB.get(key, words.shape[1]), words.shape[1])
        wslice = words[:, :mxb] if mxb < words.shape[1] else words
        buf = np.asarray(jnp.concatenate([
            (counts & 0xFFFF).astype(jnp.uint16),
            ((counts >> 16) & 0xFFFF).astype(jnp.uint16),
            wslice.reshape(-1)]))
        n_str = b * s
        counts_np = (buf[:n_str].astype(np.int32)
                     | (buf[n_str: 2 * n_str].astype(np.int32) << 16)
                     ).reshape(b, s)
        flat_w = buf[2 * n_str:].reshape(n_str, mxb)
        cap_total = _encode_capacity(t_steps, n_lanes, b * s)
        if cap_total is not None and counts_np.max() > cap_total:
            # incompressible content overflowed the compact kernel's
            # staging cap: re-encode on the unbounded scan engine
            words, counts = _device_encode_scan(
                z_dev, lane_cdf, t_steps=t_steps, n_lanes=n_lanes,
                n_streams=s)
            counts_np = np.asarray(counts).reshape(b, s)
            flat_w = None
        need = min(device_rans.bucket_words(int(counts_np.max())),
                   words.shape[1])
        if flat_w is None or need > mxb:
            flat_w = np.asarray(
                words[:, :need] if need < words.shape[1] else words
            ).reshape(n_str, -1)
        _SYNC_MXB[key] = need
        chunks = device_rans.streams_from_words(
            flat_w, counts_np.ravel(), n_syms, n_lanes)
        for i in range(b):
            out.append(container.pack(
                container.CODEC_INT8,
                [header, cdf_sections[i],
                 _pack_streams(chunks[i * s: (i + 1) * s])]))
        return out

    # native / per-image-table path (host coder, still batched transform)
    z_np = np.asarray(z_dev)
    ctx = np.broadcast_to(np.arange(c, dtype=np.int32),
                          (t_steps * lane_mult, c)).ravel()
    use_native = coder != "golden"
    for i in range(b):
        syms = z_np[i].reshape(s, -1).astype(np.int32)
        chunks = [rans.encode_interleaved(syms[j], ctx, per_image_cdfs[i],
                                          n_lanes=n_lanes,
                                          use_native=use_native)
                  for j in range(s)]
        out.append(container.pack(
            container.CODEC_INT8,
            [header, cdf_sections[i], _pack_streams(chunks)]))
    return out


def decompress_batch(params: Dict[str, jax.Array], streams: Sequence[bytes],
                     static_cdfs: np.ndarray | None = None,
                     coder: str = "auto",
                     ) -> Tuple[jax.Array, jax.Array]:
    """B containers -> (reconstructions (B, X, Y, 3) int8, latents int8).

    All streams must share image geometry (one synthesis batch); the
    entropy decode runs as ONE batched on-device call (coder="device").
    """
    coder = _pick_coder(coder)
    metas = []
    for data in streams:
        codec_id, (header, cdf_bytes, payload) = container.unpack(data)
        assert codec_id == container.CODEC_INT8
        metas.append((struct.unpack("<HHHHH", header), cdf_bytes,
                      _unpack_streams(payload)))
    (ix, iy, zx, zy, c) = metas[0][0]
    assert all(m[0] == metas[0][0] for m in metas), "mixed geometries"
    s = len(metas[0][2])
    n_syms, n_lanes, prec, off = ilrans.unpack_header(metas[0][2][0])
    assert n_syms * s == zx * zy * c
    t_steps = n_syms // n_lanes

    def cdfs_of(i):
        if metas[i][1]:
            return _deserialize_cdfs(metas[i][1], c)
        assert static_cdfs is not None, "bitstream needs the model's tables"
        return static_cdfs

    b = len(streams)
    if coder == "device" and not any(m[1] for m in metas):
        lane_cdf = jnp.asarray(_lane_cdf(cdfs_of(0), n_lanes))
        true_counts = np.asarray([(len(chunk) - off) // 2
                                  for m in metas for chunk in m[2]],
                                 np.int32)
        cap = device_rans.bucket_words(int(true_counts.max()))
        words = np.stack([
            device_rans.words_from_bytes(chunk[off:], cap)
            for m in metas for chunk in m[2]])
        # ONE combined host->device upload (counts as u16 halves +
        # words): each separate transfer over the tunneled link costs a
        # full RTT (same discipline as PipelinedDecoder)
        n_str = true_counts.size
        up = jnp.asarray(np.concatenate([
            (true_counts & 0xFFFF).astype(np.uint16),
            (true_counts >> 16).astype(np.uint16),
            words.reshape(-1)]))
        tc = (up[:n_str].astype(jnp.int32)
              | (up[n_str: 2 * n_str].astype(jnp.int32) << 16))
        wdev = up[2 * n_str:].reshape(words.shape)
        syms, ok = _device_decode_batch(
            wdev, tc, lane_cdf,
            t_steps=t_steps, impl=_decode_impl(n_lanes, cap, n_str))
        zj = syms.reshape(b, zx, zy, c)  # stays on device
        # schedule synthesis BEFORE the validity fetch: the ok check only
        # gates the error raise, so its link round trip overlaps the
        # synthesis dispatch instead of serializing ahead of it
        cfg = (REFERENCE_NET if (ix, iy) == (768, 512)
               else reference_net_for_input(ix, iy))
        x_hat = _jit_synthesis(cfg)(params, zj)
        ok_np = np.asarray(ok)
        if not ok_np.all():
            bad = int(np.flatnonzero(~ok_np)[0])
            raise ValueError(
                f"corrupt stream (image {bad // s}, chunk {bad % s})")
        return x_hat, zj
    else:
        ctx = np.broadcast_to(np.arange(c, dtype=np.int32),
                              (zx * zy // s, c)).ravel()
        zs = []
        for i, m in enumerate(metas):
            cd = cdfs_of(i)
            sy = [rans.decode_interleaved(chunk, ctx, cd,
                                          use_native=(coder != "golden"))
                  for chunk in m[2]]
            zs.append(np.concatenate(sy).reshape(zx, zy, c).astype(np.int8))
        zj = jnp.asarray(np.stack(zs))
    cfg = (REFERENCE_NET if (ix, iy) == (768, 512)
           else reference_net_for_input(ix, iy))
    x_hat = _jit_synthesis(cfg)(params, zj)
    return x_hat, zj


def compress(params: Dict[str, jax.Array], x: jax.Array,
             cfg: ModelConfig = REFERENCE_NET,
             static_cdfs: np.ndarray | None = None,
             coder: str = "auto") -> bytes:
    """Single-image convenience wrapper around ``compress_batch``."""
    assert x.shape[0] == 1, "use compress_batch for B > 1"
    return compress_batch(params, x, cfg, static_cdfs, coder)[0]


def decompress(params: Dict[str, jax.Array], data: bytes,
               static_cdfs: np.ndarray | None = None,
               coder: str = "auto") -> Tuple[jax.Array, jax.Array]:
    """Single-image convenience wrapper around ``decompress_batch``."""
    return decompress_batch(params, [data], static_cdfs, coder)


def compression_stats(x_shape, data: bytes) -> Dict[str, float]:
    n_pixels = x_shape[1] * x_shape[2]
    raw_bytes = n_pixels * x_shape[3]
    return {
        "bytes": len(data),
        "bpp": 8.0 * len(data) / n_pixels,
        "ratio": raw_bytes / len(data),
    }
