"""Reference-parameter ingestion and checkpoint I/O.

The reference ships its trained parameters as compile-time hex constants in
``memdata_nonsquare.h``: per layer a ``FixedPointWeights<SIMD, ap_int<WBIT>,
PE, TILES>`` whose storage is ``ap_uint<SIMD*WBIT> m_weights[PE][TILES]``
(``weights.hpp:110-150``), with SIMD elements little-endian-packed inside each
word, and a bias ``FixedPointWeights<1, ap_int<8>, 1, OFM_CH>``.

The fold layout -> dense ``[O, kx, ky, I]`` unpack order is spelled out by the
reference testbench (``conv3_nonsquare_tb.cpp:538-571``): for each ``pe`` the
flat (tile*SIMD + simd) index enumerates, fastest to slowest,
input-channel, kx, ky, out-channel-block; the dense out channel is
``pe + PE * block``.

This module parses that header into numpy arrays and round-trips them through
a plain ``.npz`` checkpoint (no compile step, no torch).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

from ..config import ModelConfig, REFERENCE_NET

_DECL_RE = re.compile(
    r"FixedPointWeights<\s*(\d+)\s*,\s*ap_int<(\d+)>\s*,\s*(\d+)\s*,\s*(\d+)\s*>\s*"
    r"(\w+)\s*=")
_HEX_RE = re.compile(r"0x[0-9a-fA-F]+")


def _sign_extend(vals: np.ndarray, bits: int) -> np.ndarray:
    """Two's-complement sign extension of `bits`-wide fields held in int64."""
    sign = np.int64(1) << (bits - 1)
    return ((vals ^ sign) - sign).astype(np.int64)


def _unpack_words(words: np.ndarray, simd: int, wbit: int) -> np.ndarray:
    """Split packed ap_uint<SIMD*WBIT> words into SIMD sign-extended fields.

    Field i occupies bits [i*WBIT, (i+1)*WBIT) (weights.hpp:131-141).
    Returns shape words.shape + (simd,).
    """
    shifts = (np.arange(simd, dtype=np.int64) * wbit)
    fields = (words[..., None] >> shifts) & ((np.int64(1) << wbit) - 1)
    return _sign_extend(fields, wbit)


def parse_memdata_header(path: str) -> Dict[str, np.ndarray]:
    """Parse memdata_nonsquare.h into raw packed arrays.

    Returns {name: int64 array of shape (PE, TILES, SIMD)} of sign-extended
    weight fields, for every FixedPointWeights declaration in the header.
    """
    with open(path, "r") as f:
        text = f.read()
    out: Dict[str, np.ndarray] = {}
    for m in _DECL_RE.finditer(text):
        simd, wbit, pe, tiles = (int(m.group(i)) for i in range(1, 5))
        name = m.group(5)
        # Grab everything until the terminating "};" at top level.
        start = text.index("{", m.end())
        depth, i = 0, start
        while True:
            if text[i] == "{":
                depth += 1
            elif text[i] == "}":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        body = text[start:i + 1]
        words = np.array([int(h, 16) for h in _HEX_RE.findall(body)],
                         dtype=np.uint64).astype(np.int64)
        expect = pe * tiles
        if words.size != expect:
            raise ValueError(f"{name}: parsed {words.size} words, "
                             f"expected PE*TILES={expect}")
        out[name] = _unpack_words(words.reshape(pe, tiles), simd, wbit)
    return out


def fold_to_dense(folded: np.ndarray, out_ch: int, in_ch: int, k: int
                  ) -> np.ndarray:
    """(PE, TILES, SIMD) fold layout -> dense [O, kx, ky, I] int8.

    Per pe, the flat (tile*SIMD + simd) stream decomposes slowest-to-fastest as
    [out-block][ky][kx][in-channel]; dense out channel = pe + PE*block
    (conv3_nonsquare_tb.cpp:546-571).
    """
    pe_n, tiles, simd = folded.shape
    flat = folded.reshape(pe_n, tiles * simd)
    assert tiles * simd == (out_ch // pe_n) * k * k * in_ch
    per_pe = flat.reshape(pe_n, out_ch // pe_n, k, k, in_ch)  # [pe, blk, ky, kx, I]
    dense = np.zeros((out_ch, k, k, in_ch), np.int8)
    for pe in range(pe_n):
        # [blk, ky, kx, I] -> [blk, kx, ky, I] (W index order is [O][kx][ky][I])
        dense[pe::pe_n] = per_pe[pe].transpose(0, 2, 1, 3).astype(np.int8)
    return dense


def load_reference_params(header_path: str,
                          cfg: ModelConfig = REFERENCE_NET
                          ) -> Dict[str, np.ndarray]:
    """Load + unpack all 8 layers' weights and biases from the reference header.

    Returns {"w0".."w7": int8 [O,kx,ky,I], "b0".."b7": int8 [O]}.
    """
    raw = parse_memdata_header(header_path)
    params: Dict[str, np.ndarray] = {}
    for i, layer in enumerate(cfg.layers):
        w = raw[f"weights_layer{i}"]
        assert w.shape == (layer.pe, layer.w_tiles, layer.simd), \
            (i, w.shape, (layer.pe, layer.w_tiles, layer.simd))
        params[f"w{i}"] = fold_to_dense(w, layer.out_ch, layer.in_ch, layer.kernel)
        b = raw[f"bias_layer{i}"]  # (1, OFM_CH, 1)
        assert b.shape == (1, layer.out_ch, 1)
        params[f"b{i}"] = b.reshape(layer.out_ch).astype(np.int8)
    return params


def save_checkpoint(path: str, params: Dict[str, np.ndarray]) -> None:
    np.savez_compressed(path, **params)


def load_checkpoint(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}
