"""Assembled-training-loss oracle: the repo's ``make_loss_of`` vs the
reference's loss-in-forward (Training/ptsemseg/models/td4_psp/
td4_psp.py:367-374) on identical weights/frames/labels, teacher attached,
train mode, dropout forced off both sides.

This is the one place the whole recipe meets: CE(out) + 0.5*CE(out_sub)
+ 0.1*CE(aux) + [KL(out||T_full) + 0.5*KL(out_sub||T_group_p)], including
the teacher tuple crossing (T_logit indexing by pos_id) and train-mode
BN batch statistics.
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

from tests.test_clip_parity import (_load_training_model, _patch_ln,
                                    _randomize, _training_sd_to_testing_names)
from tests.test_teacher_surgery import _make_source_psp_sd, _ref_import

IN_HW = (65, 129)


def _zero_dropout(module):
    for m in module.modules():
        if isinstance(m, (torch.nn.Dropout, torch.nn.Dropout2d)):
            m.p = 0.0


def _build_ref_teacher(sd):
    """Reference pspnet_4p seeded from ``sd`` via the reference's own
    split_psp_state_dict (same construction as test_teacher_surgery)."""
    putils = _ref_import("ptsemseg.utils")
    p4p_mod = _ref_import("ptsemseg.models.td4_psp.pspnet_4p")
    res_mod = _ref_import("ptsemseg.models.td4_psp.resnet")

    def make_resnet(pretrained=False, **kw):
        kw.pop("root", None)
        return res_mod.ResNet(res_mod.Bottleneck, [3, 4, 6, 3], **kw)

    p4p_mod.resnet101 = make_resnet
    ref = p4p_mod.pspnet_4p(nclass=19, norm_layer=torch.nn.BatchNorm2d,
                            backbone="resnet101", teacher_model=None,
                            path_num=4, fixed=True)
    (backbone_state, psp_state, g1, g2, g3, g4,
     head_state, _aux) = putils.split_psp_state_dict(sd, 4)
    ref.pretrained.load_state_dict(backbone_state, strict=True)
    for i, gs in enumerate((g1, g2, g3, g4), 1):
        getattr(ref, f"group{i}").load_state_dict(gs, strict=True)
        getattr(ref, f"psp{i}").load_state_dict(psp_state, strict=True)
    ref.head.load_state_dict(head_state, strict=True)
    ref.eval()
    return ref


@pytest.mark.parametrize("loss_name", [
    # ohem is the recipe the reference ships (and a superset of the ce
    # dataflow); plain ce runs in the slow oracle lane
    pytest.param("ce", marks=pytest.mark.slow),
    "ohem",
])
def test_full_recipe_loss_matches_reference(loss_name):
    from tdnet_tpu.models.tdnet import TDNetConfig
    from tdnet_tpu.models.teacher import TeacherConfig
    from tdnet_tpu.train.loss import cross_entropy, ohem_cross_entropy
    from tdnet_tpu.train.trainer import make_loss_of
    from tdnet_tpu.utils.surgery import teacher_from_psp_checkpoint
    from tdnet_tpu.utils.torch_import import tdnet_from_torch

    # ---- reference side: student (train mode) + attached teacher --------
    ref = _load_training_model("td4_psp", 4, "resnet18")
    _randomize(ref, seed=31)
    cfg = TDNetConfig(nclass=19, backbone="resnet18", path_num=4,
                      in_size=IN_HW, kv_stride=3, pool_before_proj=True,
                      aux=True)
    _patch_ln(ref, cfg.feat_hw)
    g = torch.Generator().manual_seed(7)
    for m in ref.modules():
        if isinstance(m, torch.nn.LayerNorm):
            with torch.no_grad():
                m.weight.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)

    src_sd = _make_source_psp_sd("resnet50", seed=43, inter=512)
    ref.teacher = _build_ref_teacher(src_sd)

    n_min = IN_HW[0] * IN_HW[1] // 16
    if loss_name == "ce":
        ref.loss_fn = torch.nn.CrossEntropyLoss(ignore_index=250)
        our_loss_fn = lambda lg, lb: cross_entropy(lg, lb, 250)
    else:
        loss_mod = _ref_import("ptsemseg.loss.loss")
        ref.loss_fn = loss_mod.OhemCELoss2D(n_min, thresh=0.7,
                                            ignore_index=250)
        our_loss_fn = lambda lg, lb: ohem_cross_entropy(
            lg, lb, n_min=n_min, thresh=0.7, ignore_index=250)

    _zero_dropout(ref)
    _zero_dropout(ref.teacher)
    ref.train()
    ref.teacher.eval()

    # ---- our side: same weights through the importers --------------------
    sd = _training_sd_to_testing_names(ref.state_dict(), 4)
    params = tdnet_from_torch(sd, cfg)
    tcfg = TeacherConfig(nclass=19, backbone="resnet50", path_num=4)
    src_np = {k: np.asarray(v.numpy()) for k, v in src_sd.items()}
    t_params = teacher_from_psp_checkpoint(src_np, tcfg)

    loss_of = make_loss_of(cfg, teacher_cfg=tcfg, loss_fn=our_loss_fn,
                           use_dropout=False)
    loss_jit = jax.jit(
        lambda p, fr, lb, pid, tp: loss_of(p, fr, lb, pid,
                                           jax.random.PRNGKey(0), tp))

    rng = np.random.RandomState(3)
    # batch 2: torch train-mode BN rejects a single value per channel
    # on the PSP pool-1 branch (the reference relies on SyncBN counts)
    frames = rng.randn(4, 2, 3, *IN_HW).astype(np.float32) * 0.5
    labels = rng.randint(0, 19, (2, *IN_HW)).astype(np.int64)
    labels[:, :7] = 250  # exercise ignore_index
    f_list = [torch.from_numpy(f) for f in frames]
    lbl_t = torch.from_numpy(labels)
    frames_j = jnp.asarray(np.transpose(frames, (0, 1, 3, 4, 2)))
    labels_j = jnp.asarray(labels.astype(np.int32))

    for pos_id in range(4):
        with torch.no_grad():
            ref_loss = float(ref(f_list, lbl=lbl_t, pos_id=pos_id))
        got, aux = loss_jit(params, frames_j, labels_j, pos_id, t_params)
        got = float(got)
        assert float(aux["kd"]) > 0.0, "KD term inactive — teacher unwired"
        np.testing.assert_allclose(
            got, ref_loss, rtol=2e-3, atol=2e-3,
            err_msg=f"{loss_name} full-recipe loss pos_id {pos_id}")
