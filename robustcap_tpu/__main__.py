r"""Command-line interface.

The reference has no CLI (entry points are edited ``__main__`` blocks,
SURVEY.md §5); this exposes the main workflows:

  python -m robustcap_tpu eval --dataset aist [--no-smplify] [--weights W]
  python -m robustcap_tpu latency [--frames N]
  python -m robustcap_tpu live-server --weights W
  python -m robustcap_tpu train --rnn 7 --aist data/... [--amass data/...]
"""

from __future__ import annotations

import argparse
import json
import sys


def _load_params(args):
    from robustcap_tpu.models import sig_mp
    if args.weights:
        if args.weights.endswith(".pt"):
            return sig_mp.load_torch_checkpoint(args.weights)
        from robustcap_tpu.train import load_pytree
        return load_pytree(args.weights)
    import jax
    print("warning: no --weights given; using random parameters",
          file=sys.stderr)
    return sig_mp.init_params(jax.random.PRNGKey(0))


def cmd_eval(args):
    from robustcap_tpu.eval import (evaluate_aist_ours, evaluate_pw3d_ours,
                                    evaluate_tc_ours)
    params = _load_params(args)
    kw = dict(run_smplify=not args.no_smplify, params=params,
              use_cache=not args.no_cache)
    if args.dataset == "aist":
        out = evaluate_aist_ours(**kw)
    elif args.dataset in ("tc", "totalcapture"):
        out = evaluate_tc_ours(**kw)
    elif args.dataset == "pw3d":
        out = evaluate_pw3d_ours(occ=False, **kw)
    elif args.dataset == "pw3d_occ":
        out = evaluate_pw3d_ours(occ=True, **kw)
    else:
        raise SystemExit(f"unknown dataset {args.dataset}")
    print(json.dumps({k: out[k] for k in
                      ("mpjpe", "pve", "pampjpe", "tran_error")}))


def _int8_mode(params, cfg):
    r"""Quantize weights and flip the int8-MXU flag on ``cfg`` (the shared
    --int8-compute CLI handling)."""
    import dataclasses
    from robustcap_tpu.nn.rnn import quantize_params
    return quantize_params(params), dataclasses.replace(cfg,
                                                        int8_compute=True)


def cmd_latency(args):
    from robustcap_tpu.config import SigMPConfig
    from robustcap_tpu.smpl import default_body_model
    from robustcap_tpu.streaming import measure_streaming_latency
    params = _load_params(args)
    cfg = None
    if args.int8_compute:
        params, cfg = _int8_mode(params, SigMPConfig.live_mode())
    stats = measure_streaming_latency(params, default_body_model(), cfg=cfg,
                                      n_frames=args.frames,
                                      trace_dir=args.trace_dir)
    print(json.dumps(stats))


def cmd_live_server(args):
    from robustcap_tpu.streaming import run_live_demo
    if args.bundle:
        from robustcap_tpu.serving import ServingBundle
        run_live_demo(net=ServingBundle.load(args.bundle))
    else:
        run_live_demo(_load_params(args))


def cmd_imu_bridge(args):
    from robustcap_tpu.sensors import run_imu_bridge
    run_imu_bridge()


def cmd_preprocess(args):
    from robustcap_tpu.preprocess import corpus
    if args.dataset == "aist":
        counts = corpus.preprocess_aist(args.raw, args.out,
                                        kinds=args.kinds.split(","))
        print(json.dumps(counts))
    elif args.dataset == "aist_pre":
        flagged = corpus.write_not_aligned(args.raw, out_path=args.out or None)
        print(json.dumps({"not_aligned": flagged}))
    elif args.dataset in ("tc_pre", "totalcapture_pre"):
        print(corpus.preprocess_totalcapture_pre(args.raw))
    elif args.dataset in ("tc", "totalcapture"):
        n = corpus.preprocess_totalcapture(args.raw, args.out)
        print(json.dumps({"sequences": n}))
    elif args.dataset in ("pw3d", "pw3d_occ"):
        n = corpus.preprocess_3dpw(args.raw, args.out,
                                   occ=args.dataset.endswith("occ"))
        print(json.dumps({"person_sequences": n}))
    elif args.dataset == "amass":
        from robustcap_tpu.preprocess import preprocess_amass
        from robustcap_tpu.smpl import default_body_model
        preprocess_amass(default_body_model(), args.raw, args.out)
    else:
        raise SystemExit(f"unknown dataset {args.dataset}")


def cmd_train(args):
    from robustcap_tpu.eval.datasets import load_torch_file
    from robustcap_tpu.train import trainers
    import os
    aist_tr = load_torch_file(os.path.join(args.aist, "train.pt"))
    aist_va = load_torch_file(os.path.join(args.aist, "val.pt"))
    amass_tr = amass_va = None
    if args.amass:
        amass_tr = load_torch_file(os.path.join(args.amass, "train.pt"))
        amass_va = load_torch_file(os.path.join(args.amass, "val.pt"))
    if args.rnn == "all":
        trainers.train_all(aist_tr, aist_va, amass_tr, amass_va)
    elif args.rnn == "8":
        trainers.train_rnn8(amass_tr, amass_va)
    else:
        fn = getattr(trainers, f"train_rnn{args.rnn}")
        fn(aist_tr, aist_va, amass_tr, amass_va)


def cmd_quantize(args):
    r"""Produce the int8 serving artifact from a torch or pytree checkpoint
    (docs/PERFORMANCE.md: 4x smaller weights at bf16-comparable speed —
    bf16 remains the fastest measured configuration)."""
    import jax
    from robustcap_tpu.nn.rnn import quantize_params
    params = _load_params(args)
    qp = quantize_params(params)
    if args.out.endswith(".orbax") or args.orbax:
        from robustcap_tpu.train import save_checkpoint_orbax
        save_checkpoint_orbax(qp, args.out)
    else:
        from robustcap_tpu.train import save_pytree
        save_pytree(qp, args.out)
    import numpy as np
    nbytes = sum(np.asarray(x).nbytes for x in jax.tree.leaves(qp))
    print(json.dumps({"out": args.out, "bytes": int(nbytes)}))


def cmd_export(args):
    r"""AOT-export the streaming step to a serving bundle (StableHLO via
    jax.export + weights + config manifest; robustcap_tpu/serving.py)."""
    from robustcap_tpu.config import SigMPConfig
    from robustcap_tpu.serving import export_serving_bundle
    from robustcap_tpu.smpl import default_body_model

    import dataclasses
    params = _load_params(args)
    cfg = SigMPConfig.live_mode() if args.live else SigMPConfig()
    if args.int8_compute:
        params, cfg = _int8_mode(params, cfg)
    if args.chunk_len and args.pallas_serve:
        cfg = dataclasses.replace(cfg, pallas_serve=True)
    manifest = export_serving_bundle(
        params, default_body_model(), cfg, args.out,
        platforms=(tuple(args.platforms.split(","))
                   if args.platforms else None),
        chunk_len=args.chunk_len)
    print(json.dumps({"out": args.out,
                      "platforms": manifest["platforms"],
                      "chunk_mode": manifest["chunk_mode"]}))


def main(argv=None):
    p = argparse.ArgumentParser(prog="robustcap_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("eval", help="offline dataset evaluation")
    pe.add_argument("--dataset", default="aist",
                    choices=["aist", "tc", "totalcapture", "pw3d",
                             "pw3d_occ"])
    pe.add_argument("--weights")
    pe.add_argument("--no-smplify", action="store_true")
    pe.add_argument("--no-cache", action="store_true")
    pe.set_defaults(fn=cmd_eval)

    pl = sub.add_parser("latency", help="streaming latency harness")
    pl.add_argument("--weights")
    pl.add_argument("--frames", type=int, default=600)
    pl.add_argument("--trace-dir")
    pl.add_argument("--int8-compute", action="store_true",
                    help="approximate int8-MXU serving mode (quantizes the "
                         "weights if the checkpoint is not already int8)")
    pl.set_defaults(fn=cmd_latency)

    ps = sub.add_parser("live-server", help="live inference server")
    ps.add_argument("--weights")
    ps.add_argument("--bundle",
                    help="serve a precompiled AOT bundle (export subcommand)")
    ps.set_defaults(fn=cmd_live_server)

    pb = sub.add_parser("imu-bridge", help="BLE IMU -> UDP bridge")
    pb.set_defaults(fn=cmd_imu_bridge)

    pp = sub.add_parser("preprocess", help="raw corpus -> work .pt dicts")
    pp.add_argument("--dataset", required=True,
                    choices=["aist", "aist_pre", "tc_pre", "totalcapture_pre",
                             "tc", "totalcapture", "pw3d", "pw3d_occ",
                             "amass"])
    pp.add_argument("--raw", required=True, help="raw corpus root")
    pp.add_argument("--out", default="", help="output work dir / file")
    pp.add_argument("--kinds", default="test",
                    help="comma-separated splits (aist)")
    pp.set_defaults(fn=cmd_preprocess)

    pq = sub.add_parser("quantize",
                        help="int8-quantize a checkpoint for serving")
    pq.add_argument("--weights", required=True,
                    help="torch .pt or pickle pytree checkpoint")
    pq.add_argument("--out", required=True, help="output path")
    pq.add_argument("--orbax", action="store_true",
                    help="write an orbax checkpoint instead of a pickle")
    pq.set_defaults(fn=cmd_quantize)

    px = sub.add_parser("export",
                        help="AOT-export the streaming step to a serving "
                             "bundle (no re-trace at load)")
    px.add_argument("--weights")
    px.add_argument("--out", required=True, help="bundle directory")
    px.add_argument("--platforms", default="",
                    help="comma-separated lowering targets (default: the "
                         "current backend)")
    px.add_argument("--live", action="store_true",
                    help="live-demo flag set (conf gates, throttle)")
    px.add_argument("--int8-compute", action="store_true",
                    help="quantize weights and export the int8-MXU mode")
    px.add_argument("--chunk-len", type=int, default=0,
                    help="also export a K-frame chunk program")
    px.add_argument("--pallas-serve", action="store_true",
                    help="chunk program = the whole-step weight-resident "
                         "kernel (ops/pallas_serve.py; platform-specific)")
    px.set_defaults(fn=cmd_export)

    pt = sub.add_parser("train", help="train fusion RNNs")
    pt.add_argument("--rnn", default="all",
                    choices=["all", "2", "3", "4", "6", "7", "8"])
    pt.add_argument("--aist", required=True)
    pt.add_argument("--amass")
    pt.set_defaults(fn=cmd_train)

    args = p.parse_args(argv)
    # multi-host no-op unless a coordinator is configured via
    # ROBUSTCAP_COORDINATOR / JAX_COORDINATOR_ADDRESS (parallel/distributed)
    from robustcap_tpu.parallel import initialize_distributed
    initialize_distributed()
    args.fn(args)


if __name__ == "__main__":
    main()
