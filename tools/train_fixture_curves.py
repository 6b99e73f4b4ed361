r"""Train all six sig_mp heads on fixture corpora and record loss curves.

The training-convergence artifact (VERDICT r2 item 3): drives the ACTUAL
trainers (``train/trainers.py``) — real feature engineering, losses,
augmentation, LR schedules — on procedural fixture corpora, then collects
each head's ``metrics.jsonl`` into one JSON document plus a Markdown
summary under ``docs/``. Every head's train loss must decrease; the tool
exits nonzero otherwise.

Usage::

    python tools/train_fixture_curves.py [--epochs 3] [--seqs 4]
        [--frames 64] [--widths full|small] [--cpu]
        [--out docs/train_curves.json]

``--widths small`` shrinks the hidden sizes (CI/degraded hosts);
``full`` (default) trains the production widths — run it on the TPU or a
healthy host.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL_WIDTH = {"rnn2": 64, "rnn3": 64, "rnn4": 96, "rnn6": 96,
               "rnn7": 64, "rnn8": 64}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--seqs", type=int, default=4)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--widths", choices=("full", "small"), default="full")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "train_curves.json"))
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from robustcap_tpu.preprocess import build_fixture_dataset
    from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data
    from robustcap_tpu.train import trainers

    if args.widths == "small":
        # shrink the production widths in the spec table the trainers read
        for k, (i, o, _, d, w) in list(trainers.RNN_SPECS.items()):
            trainers.RNN_SPECS[k] = (i, o, SMALL_WIDTH[k], d, w)

    model = ParametricModel(data=synthetic_smpl_data())
    train_ds = build_fixture_dataset(model, n_seq=args.seqs, T=args.frames,
                                     n_cam=2, seed=11)
    val_ds = build_fixture_dataset(model, n_seq=max(2, args.seqs // 2),
                                   T=args.frames, n_cam=2, seed=12)

    root = tempfile.mkdtemp(prefix="rc_curves_")
    kw = dict(num_epoch=args.epochs, load_last_states=False,
              batch_size=args.batch_size)
    jobs = {
        "rnn2": lambda d: trainers.train_rnn2(train_ds, val_ds,
                                              save_dir=d, **kw),
        "rnn3": lambda d: trainers.train_rnn3(train_ds, val_ds,
                                              save_dir=d, **kw),
        "rnn4": lambda d: trainers.train_rnn4(train_ds, val_ds,
                                              save_dir=d, **kw),
        "rnn6": lambda d: trainers.train_rnn6(train_ds, val_ds,
                                              save_dir=d, **kw),
        "rnn7": lambda d: trainers.train_rnn7(train_ds, val_ds,
                                              save_dir=d, body_model=model,
                                              **kw),
        "rnn8": lambda d: trainers.train_rnn8(train_ds, val_ds,
                                              save_dir=d, **kw),
    }

    curves, ok = {}, True
    for name, job in jobs.items():
        d = os.path.join(root, name)
        t0 = time.perf_counter()
        job(d)
        recs = [json.loads(line)
                for line in open(os.path.join(d, "metrics.jsonl"))]
        first, last = recs[0], recs[-1]
        decreased = last["train_loss"] < first["train_loss"]
        ok = ok and decreased
        curves[name] = {
            "records": recs,
            "train_first": first["train_loss"],
            "train_last": last["train_loss"],
            "vald_last": last["vald_loss"],
            "decreased": decreased,
            "seconds": round(time.perf_counter() - t0, 1),
        }
        print(f"{name}: {first['train_loss']:.5f} -> "
              f"{last['train_loss']:.5f} "
              f"({'ok' if decreased else 'NOT DECREASING'}, "
              f"{curves[name]['seconds']}s)")

    doc = {
        "widths": args.widths,
        "epochs": args.epochs,
        "fixture": {"seqs": args.seqs, "frames": args.frames},
        "device": str(jax.devices()[0]),
        "heads": curves,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=2)

    md = args.out.replace(".json", ".md")
    with open(md, "w") as f:
        f.write("# Training convergence on fixture corpora\n\n"
                f"`tools/train_fixture_curves.py --widths {args.widths} "
                f"--epochs {args.epochs}` on {doc['device']}.\n"
                "All six heads trained by the ACTUAL trainers (feature\n"
                "engineering, losses, augmentation, LR schedule) on\n"
                "procedural fixture corpora; full curves in "
                "`train_curves.json`.\n\n"
                "| head | train first | train last | vald last | time |\n"
                "|---|---|---|---|---|\n")
        for name, c in curves.items():
            f.write(f"| {name} | {c['train_first']:.5f} | "
                    f"{c['train_last']:.5f} | {c['vald_last']:.5f} | "
                    f"{c['seconds']}s |\n")
    print(f"wrote {args.out} and {md}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
