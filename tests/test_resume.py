"""True-resume test: params, optimizer, scheduler and epoch all restore."""

import os

import numpy as np
import jax
import pytest

from unet_convlstm_tpu.data.moving_mnist import save_moving_mnist_npz
from unet_convlstm_tpu.data.npz_dataset import NPZSequenceDataset
from unet_convlstm_tpu.train.config import TrainConfig
from unet_convlstm_tpu.train.loop import fit


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("resume")
    npz = str(root / "mm.npz")
    save_moving_mnist_npz(npz, seq_len=3, num_samples=12, image_size=32,
                          num_digits=1, seed=0, as_xy=True)
    return root, NPZSequenceDataset(npz)


def _cfg(root, npz_path, ckpt):
    return TrainConfig(npz_path=npz_path, batch_size=8, epochs=2,
                       checkpoint_dir=str(root / ckpt),
                       model={"type": "custom", "base_ch": 4,
                              "use_skip_lstm": False, "lstm_layers": 1})


def test_resume_continues_training(setup):
    root, dataset = setup
    cfg = _cfg(root, "", "a")
    r1 = fit(cfg, dataset=dataset, verbose=False)
    last = os.path.join(cfg.checkpoint_dir, "custom_last")
    assert os.path.isdir(last)

    cfg2 = _cfg(root, "", "a")
    cfg2.epochs = 4
    r2 = fit(cfg2, dataset=dataset, verbose=False, resume_from=last)
    epochs_run = [row["epoch"] for row in r2["history"]]
    assert epochs_run == [3, 4]  # continued, not restarted

    # params actually moved on from the restored point
    p1 = jax.tree_util.tree_leaves(r1["state"]["params"])[0]
    p2 = jax.tree_util.tree_leaves(r2["state"]["params"])[0]
    assert not np.allclose(np.asarray(p1), np.asarray(p2))

    # history.csv accumulated all four epochs
    with open(os.path.join(cfg.checkpoint_dir, "history.csv")) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 1 + 4  # header + 2 + 2 epochs
