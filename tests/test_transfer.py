import numpy as np

from idgrec_tpu.ops.transfer import device_put_chunked


def test_chunked_matches_whole_small():
    x = np.arange(24, dtype=np.int8).reshape(6, 4)
    out = device_put_chunked(x)
    np.testing.assert_array_equal(np.asarray(out), x)


def test_chunked_splits_and_reassembles():
    x = np.random.default_rng(0).integers(-5, 5, size=(64, 32), dtype=np.int8)
    out = device_put_chunked(x, chunk_bytes=256)  # forces many chunks
    np.testing.assert_array_equal(np.asarray(out), x)
    assert out.dtype == x.dtype and out.shape == x.shape


def test_scalar_and_1d():
    assert float(device_put_chunked(np.float32(3.5))) == 3.5
    v = np.arange(10, dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(device_put_chunked(v, chunk_bytes=8)), v)
