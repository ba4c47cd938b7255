"""BN running-stat parity: one train-mode forward updates EXACTLY the
same running statistics as the reference training twins.

This pins the fine-print the loss oracles cannot see: which BN layers
run on which frames. In particular the reference never runs ``w_qs`` for
the sub-network processing the OLDEST frame — td4 passes ``start=True``
there (no q returned, Training/ptsemseg/models/td4_psp/transformer.py:45-50)
and td2's ``pre=True`` computes only (k, v)
(td2_psp/transformer.py:35-44) — so its w_qs BN stats must stay frozen
for that step while every other BN (backbone, psp, w_ks/w_vs, heads,
aux) updates.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

TRAIN_REF = "/root/reference/Training"
pytestmark = pytest.mark.skipif(not os.path.isdir(TRAIN_REF),
                                reason="reference repo not mounted")

from tdnet_tpu.models.tdnet import TDNetConfig, clip_forward
from tdnet_tpu.nn.module import Ctx
from tdnet_tpu.utils.torch_import import tdnet_from_torch

from tests.test_clip_parity import (_load_training_model, _patch_ln,
                                    _randomize, _training_sd_to_testing_names)

IN_HW = (97, 193)


class _StubTeacher(torch.nn.Module):
    """Frozen-teacher stand-in: the KD term needs 5 logit tensors; BN
    stats of the STUDENT are what this test compares."""

    def __init__(self, nclass, feat_hw, n_out):
        super().__init__()
        self.shape = (2, nclass, *feat_hw)
        self.n_out = n_out

    def forward(self, x):
        t = torch.zeros(self.shape)
        return tuple(t for _ in range(self.n_out))


def _zero_dropout(module):
    for m in module.modules():
        if isinstance(m, (torch.nn.Dropout, torch.nn.Dropout2d)):
            m.p = 0.0


@pytest.mark.parametrize("arch,path_num,backbone,pool_before", [
    # td4 is the heavier twin (4 paths): slow lane; td2 pins the same
    # running-stat dataflow (shared _hop_chain / cached-q code) fast
    pytest.param("td4_psp", 4, "resnet18", True, marks=pytest.mark.slow),
    ("td2_psp", 2, "resnet50", False),
])
def test_bn_running_stats_track_reference(arch, path_num, backbone,
                                          pool_before):
    ref = _load_training_model(arch, path_num, backbone)
    _randomize(ref, seed=31)
    cfg = TDNetConfig(nclass=19, backbone=backbone, path_num=path_num,
                      in_size=IN_HW, kv_stride=3,
                      pool_before_proj=pool_before, aux=True)
    _patch_ln(ref, cfg.feat_hw)
    ref.train()
    _zero_dropout(ref)
    ref.teacher = _StubTeacher(19, cfg.feat_hw, n_out=path_num + 1)
    ref.loss_fn = lambda o, l: o.float().mean()

    sd0 = {k: v.copy() for k, v in _training_sd_to_testing_names(
        ref.state_dict(), path_num).items()}
    params = jax.tree.map(lambda x: x, tdnet_from_torch(sd0, cfg))

    rng = np.random.RandomState(41)
    frames = rng.randn(path_num, 2, 3, *IN_HW).astype(np.float32) * 0.5
    lbl = torch.zeros(2, *IN_HW, dtype=torch.long)

    for step, pos_id in enumerate(range(min(path_num, 2))):
        f_list = [torch.from_numpy(f) for f in frames]
        frames_j = jnp.asarray(np.transpose(frames, (0, 1, 3, 4, 2)))
        with torch.no_grad():
            ref(f_list, lbl=lbl, pos_id=pos_id)
        res = clip_forward(params, frames_j, pos_id, cfg,
                           Ctx(train=True, use_dropout=False))
        params = res["updated_params"]

        sd_after = _training_sd_to_testing_names(ref.state_dict(), path_num)
        want = tdnet_from_torch(sd_after, cfg)
        flat_w = jax.tree_util.tree_flatten_with_path(want)[0]
        flat_g = {jax.tree_util.keystr(p): l for p, l in
                  jax.tree_util.tree_flatten_with_path(params)[0]}
        n_checked = 0
        for path, leaf in flat_w:
            key = jax.tree_util.keystr(path)
            got = np.asarray(flat_g[key])
            np.testing.assert_allclose(
                got, np.asarray(leaf), atol=2e-4, rtol=2e-3,
                err_msg=f"step {step} pos_id {pos_id}: {key}")
            n_checked += 1
        assert n_checked > 100

        # the fine print is live: the oldest sub-network's w_qs stats
        # must have stayed EXACTLY at their previous value
        sigma0 = (pos_id + 1) % path_num
        m0 = sd0[f"enc{sigma0 + 1}.w_qs.0.bn.running_mean"]
        m1 = sd_after[f"enc{sigma0 + 1}.w_qs.0.bn.running_mean"]
        if step == 0:
            np.testing.assert_array_equal(m0, m1)
        # ...while a q-producing sub-network's w_qs stats moved
        mc0 = sd0[f"enc{pos_id + 1}.w_qs.0.bn.running_mean"]
        mc1 = sd_after[f"enc{pos_id + 1}.w_qs.0.bn.running_mean"]
        assert not np.allclose(mc0, mc1)
