"""Streaming inference CLI — reference-compatible.

Mirrors ``python Testing/test.py`` (reference Testing/test.py:85-110):
round-robin streaming over a frame directory, colorized quarter-res PNG
outputs, per-frame latency print with a 6-frame warmup exclusion.

Extra TPU-era flags: --dtype {float32,bfloat16}, --in_size H W,
--warm_compile (pre-compile all path variants before timing).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp


def main(argv=None):
    parser = argparse.ArgumentParser(description="Params")
    parser.add_argument("--img_path", nargs="?", type=str,
                        default="./data/vid1", help="Path_to_Frame")
    parser.add_argument("--output_path", nargs="?", type=str,
                        default="./output/", help="Path_to_Save")
    parser.add_argument("--_td4_psp18_path", nargs="?", type=str,
                        default="./checkpoint/td4-psp18.pkl")
    parser.add_argument("--_td2_psp50_path", nargs="?", type=str,
                        default="./checkpoint/td2-psp50.pkl")
    parser.add_argument("--_psp101_path", nargs="?", type=str,
                        default="./checkpoint/psp101.pkl")
    parser.add_argument("--gpu", nargs="?", type=str, default="0",
                        help="accepted for reference compatibility (unused)")
    parser.add_argument("--model", nargs="?", type=str, default="td4-psp18",
                        help="model in [td4-psp18, td2-psp50, td2-fa, psp101]")
    parser.add_argument("--_td2_fa_path", nargs="?", type=str,
                        default="./checkpoint/td2-fa.pkl")
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--in_size", type=int, nargs=2, default=[769, 1537])
    parser.add_argument("--warm_compile", action="store_true")
    parser.add_argument("--attn_impl", type=str, default="xla",
                        choices=["xla", "pallas"])
    parser.add_argument("--stem_impl", type=str, default="oct",
                        choices=["xla", "oct", "s2d", "fused"],
                        help="stem dataflow: 'oct' im2col-matmul 7x7 "
                             "(default), 'fused' Pallas deep-stem tail "
                             "(TPU, deep-base backbones; exact to "
                             "float-sum order)")
    parser.add_argument("--quant", type=str, default=None,
                        choices=["int8"],
                        help="opt-in int8 PTQ backbone (ops/quant.py)")
    parser.add_argument("--no_save", action="store_true")
    parser.add_argument("--profile", type=str, default=None,
                        help="write a jax.profiler trace to this directory")
    parser.add_argument("--native_loader", action="store_true",
                        help="use the C++ frame loader (native/libtdloader.so)")
    parser.add_argument("--display", action="store_true",
                        help="live cv2 window like the reference "
                             "(Testing/test.py:72-74); ignored headless")
    parser.add_argument("--dataset", type=str, default="cityscapes",
                        choices=["cityscapes", "camvid", "nyud2", "nyudv2"],
                        help="sets the class count and output palette")
    parser.add_argument("--parallel", type=str, default=None,
                        choices=["group", "spatial"],
                        help="multi-chip streaming: 'group' puts one "
                             "sub-network per device and runs P frames per "
                             "super-step (~P x throughput); 'spatial' shards "
                             "each frame's H axis over all devices (lower "
                             "single-frame latency). TDNet models only.")
    parser.add_argument("--nclass", type=int, default=None,
                        help="override the class count (checkpoints trained "
                             "on non-standard label sets)")
    args = parser.parse_args(argv)
    if args.parallel and args.model in ("psp101", "td2-fa"):
        parser.error(f"--parallel targets the TDNet PSP students; "
                     f"{args.model} is not supported")

    from tdnet_tpu.data.streaming import (DATASET_META, FrameSource,
                                          decode_segmap)
    from tdnet_tpu.models import (PSPNetConfig, apply_pspnet, init_model,
                                  init_pspnet, tdnet_config)
    from tdnet_tpu.nn.module import Ctx
    from tdnet_tpu.stream.runtime import LatencyMeter, Streamer
    from tdnet_tpu.utils.torch_import import (fatd_from_torch,
                                              load_torch_state,
                                              psp_head_from_torch,
                                              resnet_from_torch,
                                              strip_module_prefix,
                                              tdnet_from_torch)

    in_size = tuple(args.in_size)
    nclass, palette = DATASET_META[args.dataset]
    if args.nclass:
        nclass = args.nclass
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.native_loader:
        from tdnet_tpu.data.native import NativeFrameSource, native_available
        if native_available():
            vid_seq = NativeFrameSource(args.img_path, in_size)
        else:
            print("native loader unavailable; falling back to Python loader")
            vid_seq = FrameSource(args.img_path, in_size)
    else:
        vid_seq = FrameSource(args.img_path, in_size)
    key = jax.random.PRNGKey(0)

    ckpt_path = {"td4-psp18": args._td4_psp18_path,
                 "td2-psp50": args._td2_psp50_path,
                 "td2-fa": args._td2_fa_path,
                 "psp101": args._psp101_path}[args.model]

    if args.model == "psp101":
        cfg = PSPNetConfig(nclass=nclass, backbone="resnet101",
                           in_size=in_size)
        if ckpt_path and os.path.isfile(ckpt_path):
            print(f"Loading pretrained model from '{ckpt_path}'")
            sd = strip_module_prefix(load_torch_state(ckpt_path))
            params = {"backbone": resnet_from_torch(sd, cfg.backbone_cfg,
                                                    "pretrained."),
                      "head": psp_head_from_torch(sd, "head.")}
        else:
            print(f"No pretrained found at '{ckpt_path}'")
            params = init_pspnet(key, cfg)
        if dtype != jnp.float32:
            params = jax.tree.map(lambda x: x.astype(dtype), params)
        fwd = jax.jit(lambda p, x: apply_pspnet(
            p, x, cfg, Ctx(train=False, stem_impl=args.stem_impl))[0])
        meter = LatencyMeter(warmup=6)

        def run_frame(i, x):
            import time
            x = x.astype(dtype)
            jax.block_until_ready(x)
            t0 = time.perf_counter()
            out = fwd(params, x)
            out.block_until_ready()
            dt = time.perf_counter() - t0
            meter.add(dt)
            return [(out, dt)]

        def flush_frames():
            return []
    else:
        streaming_kw = {} if args.model == "td2-fa" else dict(streaming=True)
        cfg = tdnet_config(args.model, nclass=nclass, in_size=in_size,
                           **streaming_kw)
        params = init_model(key, cfg)
        if ckpt_path and os.path.isfile(ckpt_path):
            print(f"Loading pretrained model from '{ckpt_path}'")
            sd = strip_module_prefix(load_torch_state(ckpt_path))
            from_torch = (fatd_from_torch if args.model == "td2-fa"
                          else tdnet_from_torch)
            params = from_torch(sd, cfg)
        else:
            print(f"No pretrained found at '{ckpt_path}'")
        if args.parallel == "group":
            from tdnet_tpu.stream.parallel_runtime import GroupStreamer
            streamer = GroupStreamer(params, cfg, dtype=dtype,
                                     attn_impl=args.attn_impl,
                                     quant=args.quant)
            print(f"group streaming over {cfg.path_num} devices "
                  f"(mesh {dict(streamer.mesh.shape)})")
        elif args.parallel == "spatial":
            from tdnet_tpu.stream.parallel_runtime import SpatialStreamer
            streamer = SpatialStreamer(params, cfg, dtype=dtype,
                                       attn_impl=args.attn_impl,
                                       quant=args.quant)
            print(f"spatially-partitioned streaming "
                  f"(mesh {dict(streamer.mesh.shape)})")
        else:
            streamer = Streamer(params, cfg, dtype=dtype,
                                attn_impl=args.attn_impl,
                                stem_impl=args.stem_impl, quant=args.quant)
        if args.warm_compile:
            example = jnp.zeros((1, *in_size, 3), dtype)
            streamer.warm_compile(example)
            streamer.reset()
        meter = streamer.meter

        if args.parallel == "group":
            def run_frame(i, x):
                return streamer.submit(jnp.asarray(x))

            def flush_frames():
                return streamer.flush()
        else:
            def run_frame(i, x):
                return [streamer.step(jnp.asarray(x))]

            def flush_frames():
                return []

    os.makedirs(args.output_path, exist_ok=True)
    import imageio.v2 as imageio
    import contextlib
    prof = (jax.profiler.trace(args.profile) if args.profile
            else contextlib.nullcontext())

    meta_queue = []   # (img_name, folder) awaiting output (group buffering)
    emitted = [0]

    def emit(out, dt):
        img_name, folder = meta_queue.pop(0)
        emitted[0] += 1
        pred = np.asarray(jnp.argmax(out[0], axis=-1)).astype(np.uint8)
        if not args.no_save:
            import cv2
            small = cv2.resize(pred, (in_size[1] // 4, in_size[0] // 4),
                               interpolation=cv2.INTER_NEAREST)
            decoded = decode_segmap(small, palette)
            save_dir = os.path.join(args.output_path, folder)
            os.makedirs(save_dir, exist_ok=True)
            imageio.imwrite(os.path.join(save_dir, img_name), decoded)
        if args.display:
            # cv2's Qt backend hard-aborts without an X display, so
            # gate on $DISPLAY rather than try/except
            if not os.environ.get("DISPLAY"):
                print("(no $DISPLAY — live view disabled)")
                args.display = False
            else:
                import cv2
                cv2.namedWindow("Image")
                cv2.imshow("Image", decode_segmap(pred, palette))
                cv2.waitKey(1)
        # Group mode computes P frames per super-step: its per-frame
        # number is a throughput reciprocal, not a latency (see
        # stream/parallel_runtime.py GroupStreamer._run_group).
        label = ("Throughput/frame" if args.parallel == "group"
                 else "RunningTime/Latency")
        print(" Frame {0:2d}   {1:s}={2:3.5f} s"
              .format(emitted[0], label, dt))

    with prof:
        for i, (x, img_name, folder, ori_size) in enumerate(vid_seq):
            meta_queue.append((img_name, folder))
            for out, dt in run_frame(i, jnp.asarray(x)):
                emit(out, dt)
        for out, dt in flush_frames():
            emit(out, dt)

    print("---------------------")
    print(" Model: {0:s}".format(args.model))
    if args.parallel == "group":
        print(" Average  Throughput/frame={0:3.5f} s  ({1:.1f} FPS)".format(
            meter.avg, meter.fps))
        print(" Average  Super-step latency={0:3.5f} s  "
              "({1:d} frames per super-step)".format(
                  streamer.superstep_meter.avg, cfg.path_num))
    else:
        print(" Average  RunningTime/Latency={0:3.5f} s  ({1:.1f} FPS)".format(
            meter.avg, meter.fps))
    print("---------------------")


if __name__ == "__main__":
    main()
