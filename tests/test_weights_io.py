"""Reference parameter header parsing: layout decode + spot checks."""

import os

import numpy as np
import pytest

from simple_image_compression_network_tpu.config import REFERENCE_NET
from simple_image_compression_network_tpu.utils import weights_io

HEADER = "/root/reference/memdata_nonsquare.h"

pytestmark = pytest.mark.skipif(
    not os.path.exists(HEADER), reason="reference header not mounted")


@pytest.fixture(scope="module")
def params():
    return weights_io.load_reference_params(HEADER)


def test_shapes(params):
    for i, layer in enumerate(REFERENCE_NET.layers):
        assert params[f"w{i}"].shape == layer.weight_shape
        assert params[f"w{i}"].dtype == np.int8
        assert params[f"b{i}"].shape == (layer.out_ch,)
        # int4 range
        assert params[f"w{i}"].min() >= -8 and params[f"w{i}"].max() <= 7


def test_layer0_spot_values(params):
    # First packed word of weights_layer0 pe0 is 0x111 (memdata_nonsquare.h:6):
    # SIMD=3 fields of 4 bits each -> in-channels 0..2 of (out=0, kx=0, ky=0).
    w0 = params["w0"]
    np.testing.assert_array_equal(w0[0, 0, 0, :], [1, 1, 1])
    # Second word 0x0 -> (chan cycles to 0, kx=1): W[0][1][0][:] = 0
    np.testing.assert_array_equal(w0[0, 1, 0, :], [0, 0, 0])


def test_bias0_spot_values(params):
    # bias_layer0 begins 0xfe,0xff,0x00,0x02 -> -2,-1,0,2 repeating
    b0 = params["b0"]
    np.testing.assert_array_equal(b0[:8], [-2, -1, 0, 2, -2, -1, 0, 2])


def test_fold_roundtrip(rng):
    # fold -> dense -> refold is the inverse permutation
    pe_n, k, cin, cout = 4, 5, 6, 8
    simd = 3
    tiles = (cout // pe_n) * k * k * cin // simd
    folded = rng.integers(-8, 8, size=(pe_n, tiles, simd)).astype(np.int64)
    dense = weights_io.fold_to_dense(folded, cout, cin, k)
    # refold following the testbench enumeration (conv3_nonsquare_tb.cpp:546-571)
    refold = np.zeros_like(folded)
    for pe in range(pe_n):
        kx = ky = chan = 0
        out_chan = pe
        for f in range(tiles * simd):
            refold[pe, f // simd, f % simd] = dense[out_chan, kx, ky, chan]
            chan += 1
            if chan == cin:
                chan = 0
                kx += 1
                if kx == k:
                    kx = 0
                    ky += 1
                    if ky == k:
                        ky = 0
                        out_chan += pe_n
                        if out_chan == cout:
                            out_chan = 0
    np.testing.assert_array_equal(folded, refold)


def test_checkpoint_roundtrip(tmp_path, params):
    path = tmp_path / "ref.npz"
    weights_io.save_checkpoint(str(path), params)
    loaded = weights_io.load_checkpoint(str(path))
    assert set(loaded) == set(params)
    for k in params:
        np.testing.assert_array_equal(loaded[k], params[k])
