"""Round-5 'next' #1: the shipped recipe at PRODUCTION SHAPES on the
real TPU, sustained, through cli.main — with a mid-run SIGKILL and a
--pretrained/--start-epoch restore.

Stages:
  F. pretrain DICL on the golden scene's exact flow at 256x768 ON THE
     CHIP (the recipe pretrains DICL before freezing it, README.md:52),
     inject into a full production train state, save as ckpt0.
  0. golden eval BEFORE: cli.main -v --pretrained ckpt0.
  A. cli.main training, epochs 0-3: 256x768, nlabel=128, b=1, bf16
     (mixed_prec default), DICL frozen (--fix-flownet), ONLINE 512x5
     RANSAC pose (all defaults = the production protocol).
  B. resume --start-epoch 4 in a SUBPROCESS; SIGKILL it mid-epoch
     (exact PID — never pattern kills).
  C. resume from the last surviving Orbax checkpoint to epoch 12.
  1. golden eval AFTER: cli.main -v --pretrained final best.

Asserts: per-step loss trajectory descends, step time does not drift
epoch-over-epoch, every BatchNorm statistic in the final checkpoint is
finite, and the post-train golden eval beats the pre-train eval.
"""
import json
import os
import re
import signal
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

ROOT = "/tmp/dsfm_prod"
TREE = os.path.join(ROOT, "raw")
OUT = os.path.join(ROOT, "out")
CK0 = os.path.join(ROOT, "ckpt0")
H, W = 256, 768
NLABEL = 128
N_FRAMES, N_TEST = 48, 4
EPOCHS_A, EPOCHS_TOTAL = 4, 12

os.makedirs(ROOT, exist_ok=True)

OVR = ["--override", "depth.remat=False",
       f"data.train_size=({H},{W})", f"data.val_size=({H},{W})",
       "data.pad_multiple=128", "data.zoom_input=False",
       "data.flip_aug=False",
       "train.print_freq=10", "train.image_freq=0"]
BASE = ["--data", TREE, "--cfg", "kitti", "--dataset", "kitti_raw",
        "--gt-depth-dir", os.path.join(TREE, "gt_depth"),
        "--out", OUT, "--workers", "4", "--nlabel", str(NLABEL),
        "-b", "1", "--fix-flownet", *OVR]


def build_tree():
    from deep_sfm_revisited_tpu.data.synthetic import write_kitti_raw_tree

    if not os.path.exists(os.path.join(TREE, "train_files.txt")):
        print("rendering golden tree...", flush=True)
        write_kitti_raw_tree(TREE, n_frames=N_FRAMES, hw=(H, W),
                             focal=200.0, n_test=N_TEST)


def pretrain_flow_and_seed():
    """Stage F on the chip; writes CK0 (full production train state)."""
    import jax
    import jax.numpy as jnp

    from deep_sfm_revisited_tpu.config import FlowConfig, SfMConfig
    from deep_sfm_revisited_tpu.data.synthetic import (
        default_planes, exact_flow, forward_trajectory, render,
    )
    from deep_sfm_revisited_tpu.train.checkpoint import save_checkpoint
    from deep_sfm_revisited_tpu.train.flow_trainer import (
        create_flow_state, make_flow_train_step,
    )
    from deep_sfm_revisited_tpu.train.trainer import create_train_state

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    K = np.asarray([[200.0, 0, W / 2], [0, 200.0, H / 2], [0, 0, 1]])
    traj = forward_trajectory(6)
    planes = default_planes()
    frames = [render(K, traj[i], (H, W), planes) for i in range(6)]

    fcfg = FlowConfig(estimator="DICL")
    fmodel, fstate = create_flow_state(
        fcfg, jax.random.PRNGKey(0), sample_shape=(1, H, W), lr=2e-4,
        dtype=jnp.float32)
    fstep = make_flow_train_step(fmodel, fcfg)
    pairs = []
    for i in (1, 2, 3, 4, 5):
        pairs.append({
            "ref": jnp.asarray((frames[i][0] * 2 - 1)[None], jnp.float32),
            "target": jnp.asarray((frames[i - 1][0] * 2 - 1)[None],
                                  jnp.float32),
            "flow_gt": jnp.asarray(
                exact_flow(K, traj[i], traj[i - 1], frames[i][2])[None],
                jnp.float32),
            "flow_valid": jnp.ones((1, H, W), bool),
        })
    t0 = time.time()
    for s in range(200):
        fstate, fm = fstep(fstate, pairs[s % len(pairs)])
    epe = float(fm["epe"])
    print(f"flow pretrain: 200 steps in {time.time()-t0:.0f}s, "
          f"final EPE {epe:.2f} px", flush=True)
    assert epe < 4.0, epe

    cfg = SfMConfig.kitti(nlabel=NLABEL).override(**{
        "depth.remat": False, "data.train_size": (H, W),
        "data.val_size": (H, W), "train.batch_size": 1,
        "train.fix_flownet": True})
    model, state = create_train_state(
        cfg, jax.random.PRNGKey(0), sample_shape=(1, H, W),
        steps_per_epoch=N_FRAMES - N_TEST)
    params = dict(state.params)
    params["flow_net"] = fstate.params
    stats = dict(state.batch_stats)
    stats["flow_net"] = fstate.batch_stats
    state = state.replace(params=type(state.params)(params),
                          batch_stats=type(state.batch_stats)(stats))
    save_checkpoint(CK0, state, 0)
    print("ckpt0 saved", flush=True)


def run_cli(args, label, kill_after=None):
    """Run cli.main in a subprocess; optionally SIGKILL mid-run."""
    cmd = [sys.executable, "-c",
           "import sys; sys.path.insert(0, '/root/repo');"
           "from deep_sfm_revisited_tpu.cli import main;"
           f"import json; r = main({args!r});"
           "d = r if isinstance(r, dict) else {};"
           "print('CLI_RESULT ' + json.dumps({k: float(v) for k, v in d.items() if isinstance(v, (int, float))}))"]
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
    log = os.path.join(ROOT, f"{label}.log")
    with open(log, "w") as f:
        p = subprocess.Popen(cmd, stdout=f, stderr=subprocess.STDOUT,
                             env=env)
        if kill_after is not None:
            # wait until the run is genuinely STEPPING (past compile),
            # then let it run `kill_after` more seconds and SIGKILL it
            deadline = time.time() + 2400
            while time.time() < deadline and p.poll() is None:
                time.sleep(10)
                if "Epoch" in open(log).read():
                    break
            time.sleep(kill_after)
            if p.poll() is None:
                p.kill()  # exact PID of the child we spawned
                p.wait()
                print(f"[{label}] KILLED {kill_after}s after first "
                      f"step line (simulated crash)", flush=True)
            else:
                print(f"[{label}] exited before the kill (rc="
                      f"{p.returncode})", flush=True)
            return None
        rc = p.wait()
    out = open(log).read()
    tail = "\n".join(out.splitlines()[-12:])
    print(f"[{label}] rc={rc}\n{tail}", flush=True)
    assert rc == 0, f"{label} failed; see {log}"
    m = re.search(r"CLI_RESULT (\{.*\})", out)
    return json.loads(m.group(1)) if m else None


def latest_epoch(ckdir):
    eps = [int(d) for d in os.listdir(ckdir) if d.isdigit()]
    return max(eps) if eps else None


def main():
    import shutil

    build_tree()
    if not os.path.exists(os.path.join(CK0, "0")):
        pretrain_flow_and_seed()
    # fresh output tree per driver attempt: stale scalars.jsonl from a
    # failed attempt would corrupt the loss-trajectory parse
    if os.path.exists(OUT):
        shutil.rmtree(OUT)

    ckdir = os.path.join(OUT, "kitti", "ckpt")
    ev_before = run_cli(BASE + ["-v", "--pretrained", CK0], "eval_before")
    print("BEFORE:", ev_before, flush=True)

    t0 = time.time()
    run_cli(BASE + ["--epochs", str(EPOCHS_A), "--pretrained", CK0],
            "train_A")
    print(f"phase A wall: {time.time()-t0:.0f}s", flush=True)

    # phase B: resume, then SIGKILL mid-run (compile ~ first minutes,
    # then ~0.5 s/step; kill well into the stepping regime)
    run_cli(BASE + ["--epochs", str(EPOCHS_TOTAL), "--pretrained", ckdir,
                    "--start-epoch", str(EPOCHS_A)],
            "train_B", kill_after=90)
    k = latest_epoch(ckdir)
    print(f"last surviving checkpoint: epoch {k}", flush=True)
    assert k is not None and k >= EPOCHS_A - 1

    run_cli(BASE + ["--epochs", str(EPOCHS_TOTAL), "--pretrained", ckdir,
                    "--start-epoch", str(k + 1)], "train_C")

    # NOTE --pretrained expects a CheckpointManager ROOT (numbered
    # epoch subdirs); model_best/ is a copied epoch dir, so restore the
    # latest epoch from the root (the best epoch equals the latest here
    # — the loss trajectory is monotone at this scale)
    ev_after = run_cli(BASE + ["-v", "--pretrained", ckdir],
                       "eval_after")
    print("AFTER:", ev_after, flush=True)

    # ---- assertions -----------------------------------------------------
    # 1. loss trajectory from the JSONL scalars (loss_step ring)
    jl = os.path.join(OUT, "kitti", "train", "scalars.jsonl")
    losses = []
    for ln in open(jl):
        d = json.loads(ln)
        if d.get("tag") in ("loss_step", "train/loss_step", "loss"):
            losses.append((d.get("step", 0), d["value"]))
    losses.sort()
    vals = [v for _, v in losses]
    assert len(vals) >= 100, f"only {len(vals)} loss points"
    # epoch-mean trajectory: the b=1 per-step loss carries large
    # per-sample variance and a pose-noise floor; the honest descent
    # statistic is first-epoch mean vs last-epoch mean (measured
    # 5.40 -> 4.27 = 0.79x over 617 steps; the EVAL metric is the
    # real needle and improves 4.5x below)
    spe = N_FRAMES - N_TEST
    head = float(np.mean(vals[:spe]))
    tail_m = float(np.mean(vals[-spe:]))
    print(f"loss: first-epoch {head:.3f} -> last-epoch {tail_m:.3f} "
          f"({len(vals)} points)", flush=True)
    assert tail_m < 0.9 * head, (head, tail_m)

    # 2. step-time drift from the phase logs' Time meters
    def epoch_times(label):
        ts = []
        for ln in open(os.path.join(ROOT, f"{label}.log")):
            m = re.search(r"Time/step ([0-9.]+)s", ln)
            if m:
                ts.append(float(m.group(1)))
        return ts

    tA, tC = epoch_times("train_A"), epoch_times("train_C")
    if len(tA) > 4 and len(tC) > 4:
        mid = float(np.median(tA[len(tA) // 2:]))
        end = float(np.median(tC[len(tC) // 2:]))
        print(f"step time: phase-A median {mid:.3f}s -> phase-C median "
              f"{end:.3f}s", flush=True)
        assert end < 1.5 * mid, (mid, end)

    # 3. BN stats finite in the final checkpoint
    from deep_sfm_revisited_tpu.train.checkpoint import restore_params
    import jax

    p = restore_params(ckdir)
    bad = [str(kp) for kp, x in
           jax.tree_util.tree_leaves_with_path(p["batch_stats"])
           if not bool(np.all(np.isfinite(np.asarray(x))))]
    assert not bad, bad[:5]
    print("BN stats: all finite", flush=True)

    # 4. golden eval improved
    assert ev_after["abs_rel"] < 0.6 * ev_before["abs_rel"], (
        ev_before["abs_rel"], ev_after["abs_rel"])
    assert ev_after["a1"] > ev_before["a1"]
    print("PRODUCTION-SHAPE TPU TRAINING PROOF: PASS", flush=True)


if __name__ == "__main__":
    main()
