"""Multi-chip entropy stage: per-tile latent streams + psum rate statistics.

Completes the SURVEY §2.5 FIFO-fabric mapping: the reference's stream FIFOs
become ICI collectives — ``ppermute`` halo exchange for the transforms
(``spatial.py``) and, here, ``psum`` for the shared rate statistics / CDF
tables plus per-tile independent rANS streams for the coded latents.

Design: the image's X axis is sharded over the mesh (as in ``spatial``).
Each chip's latent tile — a contiguous block of (zx*zy, C) pixel rows —
is exactly ``s_local`` of the int8 codec's spatial streams
(``int_codec`` splits the latent into S = n_chips * s_local contiguous
row-chunks), so the sharded encoder emits byte-identical streams to the
single-chip ``int_codec.compress_batch`` with the same (S, lane_mult):
the bitstream format is tiling-invariant, the multi-chip analog of the
reference's bit-exactness bar (conv3_nonsquare_tb.cpp:1068-1123).

Entropy decode runs where the tile lives; the decoded latent feeds the
spatially-sharded synthesis without ever gathering to one chip.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import numpy as np

from ..codec import device_rans, entropy, ilrans
from ..config import ModelConfig, REFERENCE_NET
from . import spatial

_NSYM = 128  # int8 latent support (post-ReLU: 0..127)


def _local_histogram(z: jax.Array, n_sym: int = _NSYM,
                     axis_name: str | None = None) -> jax.Array:
    """(..., C) int8 latents -> (C, n_sym) int32 counts (chunked one-hot).

    ``axis_name``: set when called inside shard_map so the scan carry is
    marked device-varying from the start (shard_map rejects a carry that
    flips from replicated to varying mid-scan)."""
    c = z.shape[-1]
    flat = z.reshape(-1, c).astype(jnp.int32)
    chunk = 2048
    pad = (-flat.shape[0]) % chunk
    flat = jnp.pad(flat, ((0, pad), (0, 0)), constant_values=-1)  # -1: no bin
    grid = jnp.arange(n_sym, dtype=jnp.int32)

    def step(acc, blk):
        oh = (blk[:, :, None] == grid[None, None, :])
        return acc + jnp.sum(oh, axis=0, dtype=jnp.int32), None

    acc0 = jnp.zeros((c, n_sym), jnp.int32)
    if axis_name is not None:
        acc0 = lax.pcast(acc0, axis_name, to="varying")
    acc, _ = lax.scan(step, acc0, flat.reshape(-1, chunk, c))
    return acc


def build_static_cdfs_sharded(params: Dict[str, jax.Array], x: jax.Array,
                              mesh: Mesh, cfg: ModelConfig = REFERENCE_NET,
                              axis_name: str = "x") -> np.ndarray:
    """Per-channel latent CDF tables from X-sharded sample images.

    The rate statistics are combined across chips with ``lax.psum`` (the
    ICI collective standing in for the reference's FIFO fan-in); only the
    tiny (C, 128) table is fetched to host for CDF quantization.
    """
    def body(p, xl):
        z = spatial.analysis_local(p, xl, cfg, axis_name, None)
        return lax.psum(_local_histogram(z, axis_name=axis_name),
                        axis_name)

    counts = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(), P(None, axis_name, None, None)),
        out_specs=P()))(params, x)
    counts = np.asarray(counts, np.float64)
    rows = []
    for ch in range(counts.shape[0]):
        pmf = counts[ch] / max(counts[ch].sum(), 1.0)
        rows.append(entropy.quantize_cdf(np.append(pmf, 0.0)))
    return np.stack(rows)


def compress_sharded(params: Dict[str, jax.Array], x: jax.Array,
                     mesh: Mesh, lane_cdf: jax.Array,
                     cfg: ModelConfig = REFERENCE_NET, *,
                     s_local: int = 1, lane_mult: int = 2,
                     axis_name: str = "x"
                     ) -> Tuple[jax.Array, jax.Array]:
    """X-sharded analysis + per-tile entropy encode, all on device.

    x: (B, X, Y, 3) int8 sharded over `axis_name`.
    Returns (words (B, S, cap) u16, counts (B, S) i32), dim 1 sharded:
    stream j of image b lives on chip j // s_local.  Bytes assembled from
    these are identical to single-chip ``int_codec.compress_batch`` with
    S = n_chips * s_local streams.
    """
    n = mesh.shape[axis_name]
    b, xd, yd, _ = x.shape
    zx, zy = xd // 16, yd // 16
    c = cfg.layers[len(cfg.analysis) - 1].out_ch
    n_lanes = lane_mult * c
    assert (zx * zy) % (n * s_local * lane_mult) == 0
    t_steps = (zx * zy) // lane_mult // (n * s_local)

    def body(p, xl, cdf):
        z = spatial.analysis_local(p, xl, cfg, axis_name, None)
        syms = z.astype(jnp.int32).reshape(b * s_local, t_steps, n_lanes)
        words, counts = jax.vmap(
            lambda s: device_rans.encode(s, cdf, None))(syms)
        return (words.astype(jnp.uint16).reshape(b, s_local, -1),
                counts.reshape(b, s_local))

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(None, axis_name, None, None), P()),
        out_specs=(P(None, axis_name, None), P(None, axis_name))))
    return fn(params, x, lane_cdf)


def decompress_sharded(params: Dict[str, jax.Array], words: jax.Array,
                       true_counts: jax.Array, mesh: Mesh,
                       lane_cdf: jax.Array, out_shape: Tuple[int, int],
                       cfg: ModelConfig = REFERENCE_NET, *,
                       t_steps: int, axis_name: str = "x"
                       ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-tile entropy decode + X-sharded synthesis, all on device.

    words: (B, S, cap) u16 sharded on dim 1 (stream j on chip j//s_local),
    true_counts: (B, S) i32.  Returns (x_hat sharded over X, z sharded,
    ok (B, S)).
    """
    b, s, _ = words.shape
    n = mesh.shape[axis_name]
    s_local = s // n
    xd, yd = out_shape
    zx, zy = xd // 16, yd // 16
    c = cfg.layers[len(cfg.analysis) - 1].out_ch

    def body(p, w, tc, cdf):
        dec = jax.vmap(lambda ww: device_rans.decode(ww, cdf, None,
                                                     t_steps=t_steps))
        syms, consumed, x_fin = dec(w.reshape(b * s_local, -1))
        ok = jnp.logical_and(
            consumed == tc.reshape(-1),
            jnp.all(x_fin == ilrans.STATE_LB, axis=1)).reshape(b, s_local)
        z = syms.astype(jnp.int8).reshape(b, zx // n, zy, c)
        x_hat = spatial.synthesis_local(p, z, cfg, axis_name, None)
        return x_hat, z, ok

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(None, axis_name, None), P(None, axis_name), P()),
        out_specs=(P(None, axis_name, None, None),
                   P(None, axis_name, None, None), P(None, axis_name))))
    return fn(params, words, true_counts, lane_cdf)


def shard_streams(words: np.ndarray, counts: np.ndarray, mesh: Mesh,
                  axis_name: str = "x") -> Tuple[jax.Array, jax.Array]:
    """Place host (B, S, cap)/(B, S) stream arrays sharded over chips."""
    sh3 = NamedSharding(mesh, P(None, axis_name, None))
    sh2 = NamedSharding(mesh, P(None, axis_name))
    return (jax.device_put(jnp.asarray(words), sh3),
            jax.device_put(jnp.asarray(counts), sh2))


class ShardedIntCodec:
    """Container-level multi-chip serving wrapper for the int8 codec
    (the ``hyper_sharded.ShardedHyperCodec`` analog, round 4).

    Transforms run spatially tiled via the explicit-halo shard_map net;
    each chip rANS-codes the spatial streams of its own latent tile.
    Containers are byte-identical to single-chip
    ``int_codec.compress_batch`` with S = n_chips * s_local streams and
    the same lane_mult (asserted in tests), so single-chip and sharded
    deployments interoperate freely.
    """

    def __init__(self, params: Dict[str, jax.Array],
                 static_cdfs: np.ndarray, mesh: Mesh,
                 cfg: ModelConfig = REFERENCE_NET, *,
                 lane_mult: int = 2, axis_name: str = "x"):
        from ..codec import int_codec
        self.params = params
        self.static_cdfs = static_cdfs
        self.mesh = mesh
        self.cfg = cfg
        self.lane_mult = lane_mult
        self.axis = axis_name
        self.n = mesh.shape[axis_name]
        self._int_codec = int_codec
        self._lane_cdfs: Dict[int, jax.Array] = {}

    def _plan(self, xd: int, yd: int):
        """Single-chip stream plan for this geometry; the sharded path
        must realize the SAME plan (s_local = S / n) for byte identity."""
        zx, zy = xd // 16, yd // 16
        s, lm = self._int_codec.plan_streams(zx * zy, self.lane_mult)
        assert s % self.n == 0 and zx % self.n == 0, (
            f"stream plan S={s}, zx={zx} does not tile over "
            f"{self.n} chips")
        c = self.cfg.layers[len(self.cfg.analysis) - 1].out_ch
        n_lanes = lm * c
        return zx, zy, c, s, lm, n_lanes, (zx * zy) // lm // s

    def _tiles(self, xd: int, yd: int) -> bool:
        """True iff this geometry's stream plan lands on tile boundaries —
        the SAME predicate _plan asserts, probed via _plan itself so the
        two can never drift.  (The int8 format has no escape side channel
        — latents are always 0..127, in-table — so geometry is the only
        sharded-path precondition; see ``ShardedHyperCodec`` for the
        escape analog.)"""
        try:
            self._plan(xd, yd)
            return True
        except AssertionError:
            return False

    def _cdf(self, n_lanes: int) -> jax.Array:
        if n_lanes not in self._lane_cdfs:
            self._lane_cdfs[n_lanes] = jnp.asarray(
                self.static_cdfs[np.arange(n_lanes)
                                 % self.static_cdfs.shape[0]])
        return self._lane_cdfs[n_lanes]

    def compress_batch(self, x: jax.Array) -> list:
        from ..codec import container, device_rans
        from ..codec.int_codec import _pack_streams
        b, xd, yd, _ = x.shape
        if not self._tiles(xd, yd):
            # geometry whose stream plan does not tile over the mesh:
            # transparently fall back to the single-chip codec (shared
            # container format, so consumers cannot tell)
            return self._int_codec.compress_batch(
                self.params, x, self.cfg, static_cdfs=self.static_cdfs,
                coder="device", lane_mult=self.lane_mult)
        zx, zy, c, s, lm, n_lanes, t_steps = self._plan(xd, yd)
        xs = spatial.shard_image(x, self.mesh)
        words, counts = compress_sharded(
            self.params, xs, self.mesh, self._cdf(n_lanes), self.cfg,
            s_local=s // self.n, lane_mult=lm, axis_name=self.axis)
        counts_np = np.asarray(counts).reshape(b * s)
        mxb = min(device_rans.bucket_words(int(counts_np.max())),
                  words.shape[2])
        words_np = np.asarray(words[:, :, :mxb]).reshape(b * s, -1)
        chunks = device_rans.streams_from_words(
            words_np, counts_np, t_steps * n_lanes, n_lanes)
        import struct
        header = struct.pack("<HHHHH", xd, yd, zx, zy, c)
        return [container.pack(
            container.CODEC_INT8,
            [header, b"", _pack_streams(chunks[i * s: (i + 1) * s])])
            for i in range(b)]

    def decompress_batch(self, blobs) -> Tuple[jax.Array, jax.Array]:
        """-> (x_hat sharded over X, z sharded); raises on corruption."""
        import struct
        from ..codec import container, device_rans
        from ..codec.int_codec import _unpack_streams
        metas = []
        for data in blobs:
            cid, (hdr, cdf_b, payload) = container.unpack(data)
            assert cid == container.CODEC_INT8 and not cdf_b, (
                "sharded decode expects static-table int8 containers")
            metas.append((struct.unpack("<HHHHH", hdr),
                          _unpack_streams(payload)))
        assert all(m[0] == metas[0][0] for m in metas), "mixed geometries"
        (xd, yd, zx, zy, c) = metas[0][0]
        if not self._tiles(xd, yd):
            # same transparent single-chip fallback as compress_batch
            return self._int_codec.decompress_batch(
                self.params, blobs, static_cdfs=self.static_cdfs,
                coder="device")
        zx2, zy2, c2, s, lm, n_lanes, t_steps = self._plan(xd, yd)
        assert (zx, zy, c) == (zx2, zy2, c2)
        off = ilrans.unpack_header(metas[0][1][0])[3]
        counts = np.asarray([(len(ch) - off) // 2
                             for m in metas for ch in m[1]],
                            np.int32).reshape(len(blobs), s)
        cap = device_rans.bucket_words(int(counts.max()))
        words = np.stack([device_rans.words_from_bytes(ch[off:], cap)
                          for m in metas for ch in m[1]]
                         ).reshape(len(blobs), s, -1)
        wdev, cdev = shard_streams(words, counts, self.mesh, self.axis)
        x_hat, z, ok = decompress_sharded(
            self.params, wdev, cdev, self.mesh, self._cdf(n_lanes),
            (xd, yd), self.cfg, t_steps=t_steps, axis_name=self.axis)
        if not bool(np.asarray(ok).all()):
            raise ValueError("corrupt stream in sharded decode")
        return x_hat, z
