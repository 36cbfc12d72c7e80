"""Native capture reader tests: C++ ring buffer vs numpy oracle."""
import numpy as np
import pytest

from gps_jamming_tpu.native import CaptureReader, native_available


@pytest.fixture(scope="module")
def capture_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("native") / "cap.bin"
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, 2 * 10_000 + 2 * 321, dtype=np.uint8)
    raw.tofile(str(p))
    return str(p), raw


def _oracle_planar(raw):
    conv = (raw ^ 0x80).view(np.int8)
    return np.stack([conv[0::2], conv[1::2]])


def test_native_toolchain_builds():
    assert native_available(), "g++ build of capture_reader.cpp failed"


@pytest.mark.parametrize("force_numpy", [False, True])
def test_reader_blocks_and_halos(capture_file, force_numpy):
    path, raw = capture_file
    want = _oracle_planar(raw)
    n_total = want.shape[1]
    block, halo = 4096, 64

    with CaptureReader(path, block, halo, force_numpy=force_numpy) as r:
        assert r.using_native == (not force_numpy and native_available())
        got = []
        prev_tail = np.zeros((2, halo), np.int8)
        offset_expect = 0
        for off, b in r:
            assert off == offset_expect
            # halo prefix == previous block's tail
            np.testing.assert_array_equal(b[:, :halo], prev_tail)
            body = b[:, halo:]
            got.append(body)
            np.testing.assert_array_equal(
                body, want[:, off:off + body.shape[1]])
            prev_tail = b[:, -halo:]
            offset_expect += body.shape[1]
        full = np.concatenate(got, axis=1)
        assert full.shape[1] == n_total
        np.testing.assert_array_equal(full, want)


def test_reader_tail_block(capture_file):
    path, raw = capture_file
    n_total = raw.size // 2
    with CaptureReader(path, 4096, 0) as r:
        sizes = [b.shape[1] for _, b in r]
    assert sum(sizes) == n_total
    assert sizes[-1] == n_total % 4096


def test_reader_missing_file():
    with pytest.raises(FileNotFoundError):
        CaptureReader("/nonexistent/file.bin", 1024)
