"""Multi-chip entropy stage for the (mean-)scale hyperprior codec.

Extends ``entropy_sharded.py``'s per-tile-stream + ICI pattern (SURVEY
§2.5 FIFO row) from the int8 fixed-lane path to the hyper codec's two
tensors (VERDICT r3 missing #4):

  * float transforms (g_a, h_a, h_s, g_s) run under GSPMD: ``jit`` with
    X-axis ``NamedSharding``s, XLA inserting the conv halo exchanges —
    the idiomatic TPU form of the reference's line-buffer streaming
    (``slidingwindow.h:1254``),
  * the entropy stage runs under ``shard_map``: each chip rANS-codes the
    spatial streams of ITS latent tile (z fixed-lane rows, y per-symbol
    scale-bin contexts), so streams never cross the interconnect,
  * encoder and decoder derive mu/sigma/ctx from the decoded z_hat with
    the SAME sharded program (the ``hyper_codec.py`` bitwise-agreement
    contract, ADVICE r3).

Stream-to-chip mapping: image X is sharded n ways; with S = n * s_local
spatial streams per tensor, chip k owns streams [k*s_local, (k+1)*s_local)
— contiguous latent row-chunks, exactly the single-chip
``HyperCodec._compress_schedule`` split.  Containers are byte-identical
to the single-chip device format (asserted in tests).  Escapes (~2^-16
events) are not codable by the sharded entropy stage itself: a batch
whose escape count is nonzero transparently falls back to the
single-chip codec on both sides (``compress_batch`` re-encodes it,
``decompress_batch`` routes escape-bearing containers), so callers see
one API with no escape-handling obligations.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..codec import container, device_rans, escape, ilrans
from ..codec.hyper_codec import (_Y_MAX_DEV, _Z_MAX, _plan_lanes)
from ..codec.int_codec import _pack_streams, _unpack_streams


class ShardedHyperCodec:
    """Spatially-sharded serving wrapper around a ``HyperCodec`` /
    ``MeanScaleCodec`` (shares its tables and params)."""

    def __init__(self, codec, mesh: Mesh, axis_name: str = "x"):
        self.codec = codec
        self.mesh = mesh
        self.axis = axis_name
        self.n = mesh.shape[axis_name]
        model, params = codec.model, codec.params
        self._mean_scale = hasattr(model, "params_from_z")
        xsh = NamedSharding(mesh, P(None, axis_name, None, None))
        self._xsh = xsh

        self._analysis = jax.jit(
            lambda x: model.apply(params, x, method=model.analysis_arrays),
            in_shardings=(xsh,), out_shardings=(xsh, xsh))
        table = jnp.asarray(codec.scale_table, jnp.float32)

        def prior_ctx(z_hat):
            """z_hat -> (mu|zeros, sigma, ctx): ONE program for both
            sides, so encoder/decoder scale bins agree bitwise."""
            if self._mean_scale:
                mu, sigma = model.apply(params, z_hat,
                                        method=model.params_from_z)
            else:
                mu = None
                sigma = model.apply(params, z_hat,
                                    method=model.scales_from_z)
            # compare-sum form of searchsorted 'left' (see
            # HyperCodec._scale_ctx: XLA's searchsorted lowering is
            # ~100x slower on TPU; bins are identical)
            s = sigma.astype(jnp.float32)
            idx = jnp.sum((table < s[..., None]).astype(jnp.int32),
                          axis=-1)
            ctx = jnp.clip(idx, 0, table.shape[0] - 1).astype(jnp.int32)
            return (ctx, mu) if self._mean_scale else (ctx,)

        self._prior_ctx = jax.jit(
            prior_ctx, in_shardings=(xsh,),
            out_shardings=(xsh, xsh) if self._mean_scale else (xsh,))
        self._center = jax.jit(lambda y, mu: jnp.round(y - mu),
                               in_shardings=(xsh, xsh), out_shardings=xsh)
        self._round = jax.jit(jnp.round, in_shardings=(xsh,),
                              out_shardings=xsh)
        self._synthesis = jax.jit(
            lambda y: model.apply(params, y, method=model.decode_arrays),
            in_shardings=(xsh,), out_shardings=xsh)
        self._add_mu = jax.jit(lambda y, mu: y + mu,
                               in_shardings=(xsh, xsh), out_shardings=xsh)

    # -- per-tile entropy stage (shard_map) ------------------------------
    def _encode_tiled(self, vals: jax.Array, ctx: Optional[jax.Array],
                      cdf: jax.Array, *, t_steps: int, n_lanes: int,
                      s: int, max_abs: int):
        """vals (B, PX, PY, C) sharded on PX -> per-tile streams.

        Returns (words (B, S, cap) u16 sharded on S, counts (B, S) i32,
        escape total (scalar, psum'd))."""
        b = vals.shape[0]
        s_local = s // self.n
        ax = self.axis

        def body(v, c, cd):
            syms = escape.to_symbols(v, max_abs)
            syms = syms.reshape(b * s_local, t_steps, n_lanes)
            if c is None:
                enc = jax.vmap(lambda q: device_rans.encode(q, cd, None))
                words, counts = enc(syms)
            else:
                cr = c.reshape(b * s_local, t_steps, n_lanes)
                enc = jax.vmap(lambda q, cc: device_rans.encode(q, cd, cc))
                words, counts = enc(syms, cr)
            n_esc = lax.psum(
                jnp.sum(jnp.abs(v.astype(jnp.int32)) > max_abs), ax)
            return (words.astype(jnp.uint16).reshape(b, s_local, -1),
                    counts.reshape(b, s_local), n_esc)

        in_specs = (P(None, ax, None, None),
                    None if ctx is None else P(None, ax, None, None),
                    P())
        if ctx is None:
            fn = jax.jit(jax.shard_map(
                lambda v, cd: body(v, None, cd), mesh=self.mesh,
                in_specs=(in_specs[0], in_specs[2]),
                out_specs=(P(None, ax, None), P(None, ax), P())))
            return fn(vals, cdf)
        fn = jax.jit(jax.shard_map(
            body, mesh=self.mesh, in_specs=in_specs,
            out_specs=(P(None, ax, None), P(None, ax), P())))
        return fn(vals, ctx, cdf)

    def _decode_tiled(self, words: jax.Array, counts: jax.Array,
                      ctx: Optional[jax.Array], cdf: jax.Array, *,
                      t_steps: int, n_lanes: int, tile_shape, max_abs: int):
        """words (B, S, cap) sharded on S -> (vals (B,PX,PY,C) sharded on
        PX, ok (B, S))."""
        b, s, _ = words.shape
        s_local = s // self.n
        px, py, c = tile_shape  # global latent dims
        ax = self.axis

        def body(w, tc, cx, cd):
            wl = w.reshape(b * s_local, -1).astype(jnp.uint32)
            if cx is None:
                dec = jax.vmap(lambda q: device_rans.decode(
                    q, cd, None, t_steps=t_steps))
                syms, consumed, x_fin = dec(wl)
            else:
                cr = cx.reshape(b * s_local, t_steps, n_lanes)
                dec = jax.vmap(lambda q, cc: device_rans.decode(
                    q, cd, cc, t_steps=t_steps))
                syms, consumed, x_fin = dec(wl, cr)
            ok = jnp.logical_and(
                consumed == tc.reshape(-1),
                jnp.all(x_fin == ilrans.STATE_LB, axis=1)).reshape(
                    b, s_local)
            vals = (syms.astype(jnp.int32) - max_abs).reshape(
                b, px // self.n, py, c)
            return vals, ok

        if ctx is None:
            fn = jax.jit(jax.shard_map(
                lambda w, tc, cd: body(w, tc, None, cd), mesh=self.mesh,
                in_specs=(P(None, ax, None), P(None, ax), P()),
                out_specs=(P(None, ax, None, None), P(None, ax))))
            return fn(words, counts, cdf)
        fn = jax.jit(jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(P(None, ax, None), P(None, ax),
                      P(None, ax, None, None), P()),
            out_specs=(P(None, ax, None, None), P(None, ax))))
        return fn(words, counts, ctx, cdf)

    # -- public API ------------------------------------------------------
    def compress_batch(self, x: jax.Array) -> List[bytes]:
        """(B, X, Y, 3) [0,1] images (sharded or host) -> containers,
        byte-identical to ``codec.compress_batch`` when stream plans
        coincide (S divisible by the mesh size) and no escapes occur."""
        x = jax.device_put(x, self._xsh)
        y_f, z_f = self._analysis(x)
        prior = self._prior_ctx(z_f)
        ctx_y = prior[0]
        ysym_f = (self._center(y_f, prior[1]) if self._mean_scale
                  else self._round(y_f))
        y = ysym_f.astype(jnp.int32)
        z = z_f.astype(jnp.int32)
        b, yx, yy, yc = y.shape
        _, zx, zy, zc = z.shape
        s_z, nl_z, t_z = _plan_lanes(zx * zy, zc)
        s_y, nl_y, t_y = _plan_lanes(yx * yy, yc)
        # a chip's tile (px/n contiguous latent rows) must be a whole
        # number of spatial streams: S % n == 0 makes stream boundaries
        # land on tile boundaries (both split the flat x-major pixel
        # order evenly)
        for s, px, tag in ((s_z, zx, "z"), (s_y, yx, "y")):
            assert s % self.n == 0 and px % self.n == 0, (
                f"{tag} stream plan S={s}, rows={px} does not tile over "
                f"{self.n} chips")
        z_cdf = self.codec._dev_table(("z_lane", nl_z, zc),
                                      lambda: self.codec.z_cdfs[
                                          np.arange(nl_z) % zc])
        y_cdf = self.codec._dev_table(("y_cdfs",),
                                      lambda: self.codec.y_cdfs_dev)
        zw, zcnt, z_esc = self._encode_tiled(
            z, None, z_cdf, t_steps=t_z, n_lanes=nl_z, s=s_z,
            max_abs=_Z_MAX)
        yw, ycnt, y_esc = self._encode_tiled(
            y, ctx_y, y_cdf, t_steps=t_y, n_lanes=nl_y, s=s_y,
            max_abs=_Y_MAX_DEV)
        if int(np.asarray(z_esc)) or int(np.asarray(y_esc)):
            # escape side sections are host-assembled and not sharded:
            # transparently re-encode the whole batch on the single-chip
            # codec (escapes are ~2^-16 events, so this path is cold; the
            # container format is shared, so consumers cannot tell)
            return self.codec.compress_batch(x)
        zcnt_np = np.asarray(zcnt).reshape(b * s_z)
        ycnt_np = np.asarray(ycnt).reshape(b * s_y)
        zw_np = np.asarray(zw).reshape(b * s_z, -1)
        yw_np = np.asarray(yw).reshape(b * s_y, -1)
        z_chunks = device_rans.streams_from_words(
            zw_np, zcnt_np, t_z * nl_z, nl_z)
        y_chunks = device_rans.streams_from_words(
            yw_np, ycnt_np, t_y * nl_y, nl_y)
        header = struct.pack("<HHHHHHHH", x.shape[1], x.shape[2],
                             zx, zy, zc, yx, yy, yc)
        empty_raw = escape.pack_raw(np.zeros(0), 0)
        return [container.pack(container.CODEC_HYPERPRIOR_DEV, [
            header,
            _pack_streams(z_chunks[i * s_z: (i + 1) * s_z]),
            _pack_streams(y_chunks[i * s_y: (i + 1) * s_y]),
            empty_raw, empty_raw]) for i in range(b)]

    def decompress_batch(self, blobs: Sequence[bytes]
                         ) -> Tuple[jax.Array, jax.Array]:
        """Containers -> (x_hat, y_hat), transforms + entropy sharded."""
        metas = []
        for data in blobs:
            cid, (hdr, z_pay, y_pay, z_raw, y_raw) = container.unpack(data)
            assert cid == container.CODEC_HYPERPRIOR_DEV
            if (escape.unpack_raw(z_raw)[0].size
                    or escape.unpack_raw(y_raw)[0].size):
                # escape-bearing containers (produced by the single-chip
                # fallback in compress_batch, or by a single-chip
                # encoder) route to the single-chip decoder — same
                # transparent fallback as the encode side
                return self.codec.decompress_batch(blobs)
            metas.append((struct.unpack("<HHHHHHHH", hdr),
                          _unpack_streams(z_pay), _unpack_streams(y_pay)))
        assert all(m[0] == metas[0][0] for m in metas), "mixed geometries"
        (ix, iy, zx, zy, zc, yx, yy, yc) = metas[0][0]
        b = len(blobs)
        s_z, nl_z, t_z = _plan_lanes(zx * zy, zc)
        s_y, nl_y, t_y = _plan_lanes(yx * yy, yc)

        def gather(chunk_lists, s):
            off = ilrans.unpack_header(chunk_lists[0][0])[3]
            counts = np.asarray([(len(ch) - off) // 2
                                 for chs in chunk_lists for ch in chs],
                                np.int32).reshape(b, s)
            cap = device_rans.bucket_words(int(counts.max()))
            words = np.stack([device_rans.words_from_bytes(ch[off:], cap)
                              for chs in chunk_lists for ch in chs])
            sh3 = NamedSharding(self.mesh, P(None, self.axis, None))
            sh2 = NamedSharding(self.mesh, P(None, self.axis))
            return (jax.device_put(
                jnp.asarray(words.reshape(b, s, -1)), sh3),
                jax.device_put(jnp.asarray(counts), sh2))

        z_cdf = self.codec._dev_table(("z_lane", nl_z, zc),
                                      lambda: self.codec.z_cdfs[
                                          np.arange(nl_z) % zc])
        y_cdf = self.codec._dev_table(("y_cdfs",),
                                      lambda: self.codec.y_cdfs_dev)
        z_words, z_counts = gather([m[1] for m in metas], s_z)
        z_vals, z_ok = self._decode_tiled(
            z_words, z_counts, None, z_cdf, t_steps=t_z, n_lanes=nl_z,
            tile_shape=(zx, zy, zc), max_abs=_Z_MAX)
        z_hat = jax.jit(lambda v: v.astype(jnp.float32),
                        out_shardings=self._xsh)(z_vals)
        prior = self._prior_ctx(z_hat)
        ctx_y = prior[0]
        y_words, y_counts = gather([m[2] for m in metas], s_y)
        y_vals, y_ok = self._decode_tiled(
            y_words, y_counts, ctx_y, y_cdf, t_steps=t_y, n_lanes=nl_y,
            tile_shape=(yx, yy, yc), max_abs=_Y_MAX_DEV)
        y_hat = jax.jit(lambda v: v.astype(jnp.float32),
                        out_shardings=self._xsh)(y_vals)
        if self._mean_scale:
            y_hat = self._add_mu(y_hat, prior[1])
        x_hat = self._synthesis(y_hat)
        ok = np.asarray(jnp.concatenate([z_ok.ravel(), y_ok.ravel()]))
        if not ok[: z_ok.size].all():
            raise ValueError("corrupt hyper-latent stream")
        if not ok[z_ok.size:].all():
            raise ValueError("corrupt latent stream")
        return x_hat, y_hat
