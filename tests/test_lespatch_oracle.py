"""Stage-A (L0 ingest) oracle parity vs the reference.

The reference's ``preprocessing/preprocessing.py`` needs the netCDF4
package, which this image lacks — but BOMEX .nc files are NetCDF-4, i.e.
HDF5 containers, so a ~20-line shim exposing ``Dataset.variables`` over
h5py lets the reference module run UNMODIFIED as a black-box oracle.
Everything downstream of variable access — the 128/64 patch grid, loop
order, per-patch microphysics→β, metadata schema, float32 casts, pkl
naming, numeric sort + [start, end] bounds of the batch driver
(reference preprocessing.py:16-170) — is the reference's own code.
"""

import importlib.util
import os
import pickle
import sys

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from unet_convlstm_tpu.datagen.lespatch import (
    generate_patches_from_nc, process_all_nc_files,
)

REF = "/root/reference"


class _ShimVariable:
    def __init__(self, ds):
        self._ds = ds

    @property
    def shape(self):
        return self._ds.shape

    def __getitem__(self, idx):
        return self._ds[idx]


class _ShimDataset:
    """netCDF4.Dataset lookalike over an HDF5 file (read-only)."""

    def __init__(self, path, mode="r"):
        self._f = h5py.File(path, mode)
        self.variables = {k: _ShimVariable(self._f[k]) for k in self._f}

    def close(self):
        self._f.close()


@pytest.fixture()
def ref_preprocessing(monkeypatch):
    shim = type(sys)("netCDF4")
    shim.Dataset = _ShimDataset
    monkeypatch.setitem(sys.modules, "netCDF4", shim)
    # the reference module appends its parent dir to sys.path on import to
    # reach mitsuba3.calc_beta — let it (monkeypatch can't undo list
    # appends, but a duplicate path entry is harmless)
    spec = importlib.util.spec_from_file_location(
        "ref_preprocessing", os.path.join(REF, "preprocessing/preprocessing.py"))
    mod = importlib.util.module_from_spec(spec)
    monkeypatch.setitem(sys.modules, "ref_preprocessing", mod)
    spec.loader.exec_module(mod)
    return mod


def _write_bomex_nc(path, nx=192, ny=192, nz=5, seed=0):
    """A BOMEX-shaped NetCDF-4 file at reduced geometry: the reference
    hard-codes patch 128 / stride 64, so the horizontal grid must be
    >=128 (192 -> a 2x2 patch grid)."""
    rng = np.random.default_rng(seed)
    with h5py.File(path, "w") as f:
        f["x"] = (20.0 * np.arange(nx)).astype(np.float64)
        f["y"] = (20.0 * np.arange(ny)).astype(np.float64)
        f["z"] = (20.0 * np.arange(nz)).astype(np.float64)
        f["p"] = (1015.0 - 2.0 * np.arange(nz)).astype(np.float64)
        shape = (1, nz, ny, nx)
        f["QN"] = np.where(rng.random(shape) > 0.7,
                           rng.random(shape) * 2.0, 0.0)
        f["NC"] = rng.random(shape) * 120.0 + 1.0
        f["TABS"] = 285.0 + rng.standard_normal(shape)
        f["U"] = rng.standard_normal(shape) * 3.0
        f["V"] = rng.standard_normal(shape) * 3.0
        f["W"] = rng.standard_normal(shape)


def _load_patches(folder):
    out = {}
    for name in sorted(os.listdir(folder)):
        with open(os.path.join(folder, name), "rb") as f:
            out[name] = pickle.load(f)
    return out


def _assert_patch_trees_equal(ours, ref):
    assert sorted(ours) == sorted(ref)
    for name, mine in ours.items():
        theirs = ref[name]
        for key in ("id", "grid_idx", "coords_x", "coords_y"):
            assert tuple(np.atleast_1d(mine["metadata"][key])) == \
                tuple(np.atleast_1d(theirs["metadata"][key])), (name, key)
        for arr in ("U", "V", "W"):
            np.testing.assert_array_equal(mine[arr], theirs[arr], err_msg=name)
            assert mine[arr].dtype == np.float32
        np.testing.assert_allclose(mine["beta_ext"], theirs["beta_ext"],
                                   rtol=1e-6, atol=0, err_msg=name)


def test_single_file_patches_match_reference(tmp_path, ref_preprocessing):
    nc_path = str(tmp_path / "BOMEX_192x192x5_20m_20m_1s_192_0000001200.nc")
    _write_bomex_nc(nc_path)

    ref_dir = str(tmp_path / "ref_patches")
    ref_preprocessing.generate_patches_from_nc(nc_path, ref_dir)
    our_dir = str(tmp_path / "our_patches")
    generate_patches_from_nc(nc_path, our_dir, verbose=False)

    ref = _load_patches(ref_dir)
    ours = _load_patches(our_dir)
    assert len(ref) == 4  # ((192-128)//64+1)^2 patches, reference geometry
    _assert_patch_trees_equal(ours, ref)
    # the reference stores metadata['source_file'] = basename; ours too
    assert ours["sample_000.pkl"]["metadata"]["source_file"] == \
        ref["sample_000.pkl"]["metadata"]["source_file"]


def test_batch_driver_matches_reference(tmp_path, ref_preprocessing):
    """Numeric sort + inclusive [start, end] bounds + per-file output
    folder naming (reference preprocessing.py:104-170)."""
    src = tmp_path / "nc"
    src.mkdir()
    stems = ["0000000400", "0000001200", "0000002000"]
    for i, stem in enumerate(stems):
        _write_bomex_nc(str(src / f"BOMEX_192x192x5_20m_{stem}.nc"), seed=i)

    ref_out = tmp_path / "ref_out"
    ref_preprocessing.process_all_nc_files(
        str(src), str(ref_out),
        start_from_folder="0000001200", end_at_folder="0000002000")
    our_out = tmp_path / "our_out"
    process_all_nc_files(str(src), str(our_out),
                         start_from=1200, end_at=2000, verbose=False)

    assert sorted(os.listdir(ref_out)) == ["0000001200", "0000002000"]
    assert sorted(os.listdir(our_out)) == sorted(os.listdir(ref_out))
    for folder in os.listdir(ref_out):
        _assert_patch_trees_equal(_load_patches(our_out / folder),
                                  _load_patches(ref_out / folder))
