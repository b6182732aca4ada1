"""Regression tests for the driver-facing ``__graft_entry__`` module.

Round 1's only red artifact was ``dryrun_multichip`` failing to obtain 8
virtual devices because the environment pre-latches the TPU backend before
the entry module runs. These tests run the real entry functions in-process
on the conftest-provided 8-device virtual CPU mesh, so a regression in
either entry point fails the suite instead of only the driver artifact.
"""

import importlib.util
import pathlib
import sys

import numpy as np

import jax

_ENTRY_PATH = pathlib.Path(__file__).resolve().parent.parent / \
    "__graft_entry__.py"


def _load_entry_module():
    spec = importlib.util.spec_from_file_location("__graft_entry__",
                                                  _ENTRY_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("__graft_entry__", mod)
    spec.loader.exec_module(mod)
    return mod


def test_dryrun_multichip_runs_on_virtual_mesh(capsys):
    """The full driver dryrun (DP step + TP forward + SP pipeline) must
    execute on 8 virtual CPU devices and print its OK lines."""
    mod = _load_entry_module()
    mod.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "DP step OK" in out
    assert "TP train step OK" in out
    assert "SP time-pipelined ConvLSTM OK" in out


def test_ensure_devices_is_idempotent_and_satisfied():
    mod = _load_entry_module()
    # conftest already forced cpu/8 — must be a no-op, not an error.
    mod._ensure_devices(8)
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) >= 8


def test_entry_traces_to_expected_output_shape():
    """``entry()`` must produce a jittable fn; validate via abstract eval
    (tracing exercises the whole model without a 64²/base-64 CPU compile)."""
    mod = _load_entry_module()
    fn, args = mod.entry()
    out = jax.eval_shape(fn, *args)
    variables, x = args
    B, T, H, W, _ = x.shape
    assert out.shape == (B, T, H, W, 1)
    assert np.issubdtype(out.dtype, np.floating) or out.dtype == jax.numpy.bfloat16
