"""Checkpoint conversion CLI.

Converts reference PyTorch checkpoints into native pytree pickles so
inference/training hosts never need torch:

  python -m tdnet_tpu.cli.convert --arch td4-psp18 --src td4-psp18.pkl \
      --dst td4-psp18.npz.pkl [--in_size 769 1537] [--streaming]

  # single-path PSPNet -> TDNet bootstrap (channel surgery)
  python -m tdnet_tpu.cli.convert --arch td4_psp --bootstrap --src psp18.pkl ...

  # teacher surgery
  python -m tdnet_tpu.cli.convert --arch pspnet_4p --src psp101.pkl ...
"""

from __future__ import annotations

import argparse

import jax


def main(argv=None):
    parser = argparse.ArgumentParser(description="checkpoint converter")
    parser.add_argument("--arch", required=True,
                        help="td4-psp18 | td2-psp50 | td4_psp | td2_psp | "
                             "td2_fa | pspnet_4p | pspnet_2p")
    parser.add_argument("--src", required=True, help="torch .pkl checkpoint")
    parser.add_argument("--dst", required=True, help="native pytree output")
    parser.add_argument("--in_size", type=int, nargs=2, default=[769, 1537])
    parser.add_argument("--streaming", action="store_true",
                        help="use streaming-twin KV settings")
    parser.add_argument("--bootstrap", action="store_true",
                        help="src is a single-path PSPNet; run channel "
                             "surgery into a fresh TDNet")
    parser.add_argument("--nclass", type=int, default=19)
    args = parser.parse_args(argv)

    from tdnet_tpu.models import (TeacherConfig, init_model, tdnet_config)
    from tdnet_tpu.utils.checkpoint import save_pytree
    from tdnet_tpu.utils.surgery import (student_bootstrap_from_psp_checkpoint,
                                         teacher_from_psp_checkpoint)
    from tdnet_tpu.utils.torch_import import (fatd_from_torch,
                                              load_torch_state,
                                              strip_module_prefix,
                                              tdnet_from_torch)
    from tdnet_tpu.models import FATDConfig

    sd = strip_module_prefix(load_torch_state(args.src))
    arch = args.arch.replace("-", "_")

    if arch in ("pspnet_4p", "pspnet_2p"):
        tcfg = TeacherConfig(nclass=args.nclass,
                             path_num=4 if arch == "pspnet_4p" else 2)
        params = teacher_from_psp_checkpoint(sd, tcfg)
    else:
        cfg = tdnet_config(arch, nclass=args.nclass,
                           in_size=tuple(args.in_size),
                           streaming=args.streaming)
        if args.bootstrap:
            fresh = init_model(jax.random.PRNGKey(0), cfg)
            params = student_bootstrap_from_psp_checkpoint(sd, cfg, fresh)
        elif isinstance(cfg, FATDConfig):
            params = fatd_from_torch(sd, cfg)
        else:
            params = tdnet_from_torch(sd, cfg)

    save_pytree(args.dst, params)
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"wrote {args.dst}: {n / 1e6:.1f}M params ({arch})")


if __name__ == "__main__":
    main()
