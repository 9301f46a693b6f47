#!/usr/bin/env python
"""Resumable multi-seed driver for tools/parity_train.py (the north-star
accuracy-parity experiment, BASELINE.md).

Runs each (task, seed) as a subprocess with the fixed r2 protocol
(classification: 60 epochs, 128 train / 64 test; segmentation: 30 epochs,
64 train / 32 test; both at n_desired_nds=1000, Adam 1e-3, transplanted
torch init — see tools/parity_train.py), writing one JSON per seed into
--outdir so an interrupted sweep resumes where it left off. Both
frameworks run single-threaded CPU, so per-seed results are deterministic
and reruns reproduce earlier rounds' numbers bit-for-bit (verified in
round 3: rerun of cls seed 0 / seg seed 0 matched PARITY_*.json r2 values
exactly).

Aggregation: mean ± stderr per framework and an exact two-sided paired
sign test over seeds (the VERDICT r2 item: a 7-of-9 trailing pattern needs
a statistical verdict, not a narrative). Reference metric being matched:
/root/reference/tools/train.py:84-87.
"""
import argparse
import json
import math
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

PROTOCOL = {
    "classification": ["--epochs", "60", "--train_size", "128",
                       "--test_size", "64"],
    "segmentation": ["--task", "segmentation", "--epochs", "30",
                     "--train_size", "64", "--test_size", "32"],
}


def run_seed(task, seed, outdir, eval_every, wide_test_size=0,
             save_finals=False):
    out = os.path.join(outdir, f"{task}_{seed}.json")
    if os.path.exists(out):
        print(f"[sweep] {task} seed {seed}: exists, skipping", flush=True)
        return out
    # pid-unique tmp so concurrent sweep instances (disjoint --seeds, or a
    # collision on the same seed — harmless: runs are deterministic) never
    # interleave writes to one file
    tmp = f"{out}.tmp{os.getpid()}"
    cmd = [sys.executable, os.path.join(REPO, "tools", "parity_train.py"),
           *PROTOCOL[task], "--n_desired_nds", "1000", "--seed", str(seed),
           "--eval_every", str(eval_every), "--out", tmp]
    if wide_test_size:
        cmd += ["--wide_test_size", str(wide_test_size)]
    if save_finals:
        fdir = os.path.join(outdir, "finals")
        os.makedirs(fdir, exist_ok=True)
        cmd += ["--save_finals", os.path.join(fdir, f"{task}_{seed}")]
    t0 = time.time()
    print(f"[sweep] {task} seed {seed}: running ...", flush=True)
    env = dict(os.environ, NDTPU_PLATFORM="cpu")
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-2000:], file=sys.stderr)
        print(r.stderr[-4000:], file=sys.stderr)
        raise RuntimeError(f"{task} seed {seed} failed")
    os.rename(tmp, out)
    with open(out) as f:
        d = json.load(f)
    print(f"[sweep] {task} seed {seed}: ndtpu {d['ndtpu']['test_accuracy']:.4f} "
          f"torch {d['torch_reference']['test_accuracy']:.4f} "
          f"({time.time() - t0:.0f}s)", flush=True)
    return out


def sign_test_p(wins, losses):
    """Exact two-sided binomial sign test (ties dropped)."""
    n = wins + losses
    if n == 0:
        return 1.0
    k = min(wins, losses)
    tail = sum(math.comb(n, i) for i in range(k + 1)) / 2.0 ** n
    return min(1.0, 2.0 * tail)


def paired_stats(j, t):
    """mean±stderr per side + exact sign test + paired t over seed pairs."""
    n = len(j)
    mean_j, mean_t = sum(j) / n, sum(t) / n
    sd = lambda xs, m: math.sqrt(sum((x - m) ** 2 for x in xs) / max(n - 1, 1))
    diffs = [a - b for a, b in zip(j, t)]
    mean_d = sum(diffs) / n
    sd_d = sd(diffs, mean_d)
    wins = sum(d > 0 for d in diffs)
    losses = sum(d < 0 for d in diffs)
    p = sign_test_p(wins, losses)
    t_stat = mean_d / (sd_d / math.sqrt(n)) if sd_d > 0 else 0.0
    try:
        from scipy import stats as _st
        t_p = float(2.0 * _st.t.sf(abs(t_stat), n - 1))
    except ImportError:
        t_p = math.erfc(abs(t_stat) / math.sqrt(2.0))  # normal approx
    return {
        "mean": {"ndtpu": mean_j, "torch": mean_t},
        "stderr": {"ndtpu": sd(j, mean_j) / math.sqrt(n),
                   "torch": sd(t, mean_t) / math.sqrt(n)},
        "paired_diff": {"mean": mean_d, "stderr": sd_d / math.sqrt(n)},
        "sign_test": {"ndtpu_wins": wins, "torch_wins": losses,
                      "two_sided_p": p},
        "paired_t_test": {"t": t_stat, "two_sided_p": t_p},
    }


def aggregate(task, outdir, dest):
    seeds = {}
    wide_n = 0
    for fn in sorted(os.listdir(outdir)):
        if fn.startswith(task) and fn.endswith(".json"):
            with open(os.path.join(outdir, fn)) as f:
                d = json.load(f)
            seed = fn[len(task) + 1:-5]
            seeds[seed] = {
                "ndtpu_test_accuracy": d["ndtpu"]["test_accuracy"],
                "torch_test_accuracy": d["torch_reference"]["test_accuracy"],
            }
            jw = d["ndtpu"].get("test_accuracy_wide")
            tw = d["torch_reference"].get("test_accuracy_wide")
            if jw is not None and tw is not None:
                seeds[seed]["ndtpu_test_accuracy_wide"] = jw
                seeds[seed]["torch_test_accuracy_wide"] = tw
                wide_n = max(wide_n, d.get("wide_test_size", 0))
    if not seeds:
        return
    j = [v["ndtpu_test_accuracy"] for v in seeds.values()]
    t = [v["torch_test_accuracy"] for v in seeds.values()]
    stats = paired_stats(j, t)
    result = {
        "task": task,
        "protocol": "tools/parity_train.py "
                    + " ".join(PROTOCOL[task] + ["--n_desired_nds", "1000"]),
        "n_seeds": len(j),
        "seeds": seeds,
        **stats,
    }
    wide_pairs = [(v["ndtpu_test_accuracy_wide"], v["torch_test_accuracy_wide"])
                  for v in seeds.values() if "ndtpu_test_accuracy_wide" in v]
    if wide_pairs:
        jw, tw = zip(*wide_pairs)
        result["wide"] = {"test_size": wide_n, "n_seeds": len(jw),
                          **paired_stats(list(jw), list(tw))}
    with open(dest, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    mean_d = stats["paired_diff"]["mean"]
    print(f"[sweep] {task}: n={len(j)} ndtpu {stats['mean']['ndtpu']:.4f}±"
          f"{stats['stderr']['ndtpu']:.4f} torch {stats['mean']['torch']:.4f}±"
          f"{stats['stderr']['torch']:.4f} diff {mean_d:+.4f}±"
          f"{stats['paired_diff']['stderr']:.4f} sign-test "
          f"p={stats['sign_test']['two_sided_p']:.3f}", flush=True)
    if wide_pairs:
        w = result["wide"]
        print(f"[sweep] {task} (wide n={wide_n} clouds, {len(wide_pairs)} "
              f"seeds): ndtpu {w['mean']['ndtpu']:.4f}±"
              f"{w['stderr']['ndtpu']:.4f} torch {w['mean']['torch']:.4f}±"
              f"{w['stderr']['torch']:.4f} diff "
              f"{w['paired_diff']['mean']:+.4f}±"
              f"{w['paired_diff']['stderr']:.4f} sign-test "
              f"p={w['sign_test']['two_sided_p']:.3f}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tasks", default="segmentation,classification")
    ap.add_argument("--seeds", default="0,1,2,3,4,5,6,7,8,9")
    ap.add_argument("--outdir", default=os.path.join(REPO, "parity_runs"))
    ap.add_argument("--eval_every", type=int, default=5)
    ap.add_argument("--jobs", type=int, default=1,
                    help="run this many (task, seed) subprocesses "
                         "concurrently (each is single-threaded; results "
                         "are per-seed deterministic either way)")
    ap.add_argument("--wide_test_size", type=int, default=0,
                    help="forwarded to parity_train.py: final-model eval on "
                         "this many test clouds in addition to the legacy "
                         "narrow metric (training math unchanged)")
    ap.add_argument("--save_finals", action="store_true",
                    help="save both frameworks' final weights per seed "
                         "under {outdir}/finals/ (forwarded to "
                         "parity_train.py --save_finals)")
    ap.add_argument("--aggregate_only", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)
    tasks = args.tasks.split(",")
    seeds = [int(s) for s in args.seeds.split(",")]
    if not args.aggregate_only:
        work = [(task, seed) for task in tasks for seed in seeds]
        if args.jobs <= 1:
            for task, seed in work:
                run_seed(task, seed, args.outdir, args.eval_every,
                         args.wide_test_size, args.save_finals)
                aggregate(task, args.outdir,
                          os.path.join(REPO, f"PARITY_{'CLS' if task.startswith('c') else 'SEG'}.json"))
        else:
            import concurrent.futures as cf
            import threading

            agg_lock = threading.Lock()

            def one(ts):
                task, seed = ts
                run_seed(task, seed, args.outdir, args.eval_every,
                         args.wide_test_size, args.save_finals)
                with agg_lock:
                    aggregate(task, args.outdir,
                              os.path.join(REPO, f"PARITY_{'CLS' if task.startswith('c') else 'SEG'}.json"))

            with cf.ThreadPoolExecutor(max_workers=args.jobs) as ex:
                for _ in ex.map(one, work):
                    pass
    for task in tasks:
        aggregate(task, args.outdir,
                  os.path.join(REPO, f"PARITY_{'CLS' if task.startswith('c') else 'SEG'}.json"))


if __name__ == "__main__":
    main()
