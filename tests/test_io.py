"""Shot binary I/O: numpy path, native C++ path, and cross-compatibility
with the reference's Shot_*.bin layout (nrec, nSteps) float32 row-major."""
import numpy as np
import pytest

from sep2023_tpu import io as sio
from sep2023_tpu.native import sepio


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    return rng.normal(size=(3, 4, 7, 50)).astype(np.float32)


def test_numpy_roundtrip(tmp_path, data):
    d = str(tmp_path)
    for i in range(3):
        sio.write_shot(d, i, data[i])
    back = np.stack([sio.read_shot(d, i, 7, 50) for i in range(3)])
    assert np.array_equal(back, data)


def test_reference_layout(tmp_path, data):
    """Files must be raw float32 (nrec, nt) row-major, named Shot_pr<id>.bin
    etc. (libCUFD.cu:755-768)."""
    d = str(tmp_path)
    sio.write_shot(d, 5, data[0])
    raw = np.fromfile(f"{d}/Shot_vx5.bin", dtype=np.float32)
    assert raw.shape == (7 * 50,)
    assert np.array_equal(raw.reshape(7, 50), data[0, 1])


def test_native_io_matches_numpy(tmp_path, data):
    if not sepio.available():
        pytest.skip("native sepio not built (no g++?)")
    d = str(tmp_path)
    sepio.write_shots(d, data, [0, 1, 2])
    back_native = sepio.read_shots(d, [0, 1, 2], 7, 50)
    assert np.array_equal(back_native, data)
    # cross-compat: numpy reader sees the same bytes
    back_np = np.stack([sio.read_shot(d, i, 7, 50) for i in range(3)])
    assert np.array_equal(back_np, data)


def test_native_read_missing_file_errors(tmp_path):
    if not sepio.available():
        pytest.skip("native sepio not built")
    with pytest.raises(IOError):
        sepio.read_shots(str(tmp_path), [99], 4, 10)
