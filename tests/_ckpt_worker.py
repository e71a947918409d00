"""Crash-injected streaming worker for the checkpoint/resume failure test
(round-2 verdict item #10: SURVEY §5.3/5.4 — turn dist/checkpoint.py from
roundtrip-tested into failure-tested).

Streams a FASTQ through the PRODUCTION sharded decision engine (2 virtual
CPU devices, ("dp","ep") mesh) in fixed batches, making each batch durable
with write-ahead discipline:

    1. write decision rows  -> part.<i>.tmp, fsync, atomic rename part.<i>
    2. checkpoint (cursor=i+1, running tallies, index, panel)
       via cornetto_tpu.dist.checkpoint.save_index (atomic rename)

and supports deterministic kills at the nastiest points:

    crash_spec: none            run to completion
                mid_part:<i>    die with half of batch i's rows written
                                to the tmp file (torn write)
                after_part:<i>  die after batch i's part rename but
                                BEFORE the checkpoint update
                after_ckpt:<i>  die right after batch i's checkpoint

On start the worker loads the newest checkpoint (if any) and resumes from
its cursor; leftover tmp files and parts >= cursor are recomputed.  A
completed run concatenates part files into decisions.tsv and prints final
tallies — which must be byte-identical no matter where a previous life
died.

Usage: python tests/_ckpt_worker.py <workdir> <fastq> <crash_spec>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import numpy as np  # noqa: E402

BATCH = 16
READ_LEN = 300


def build_engine():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh
    from cornetto_tpu.livefish.decide import make_sharded_engine
    from cornetto_tpu.livefish.index import build_index, build_panel_mask
    rng = np.random.default_rng(1234)
    bases = np.array(list("ACGT"))
    genome = {"ctgA": "".join(bases[rng.integers(0, 4, 50000)]),
              "ctgB": "".join(bases[rng.integers(0, 4, 30000)])}
    idx = build_index(genome, n_shards=2)
    panel = build_panel_mask(idx, [("ctgA", 0, 25000)])
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 2), ("dp", "ep"))
    return make_sharded_engine(mesh, idx, panel), idx, panel


def main() -> int:
    workdir, fastq, crash_spec = sys.argv[1], sys.argv[2], sys.argv[3]
    crash_kind, crash_i = "none", -1
    if crash_spec != "none":
        crash_kind, s = crash_spec.split(":")
        crash_i = int(s)

    from cornetto_tpu.dist import checkpoint
    from cornetto_tpu.livefish.stream import batches_from_fastq

    ckpt = os.path.join(workdir, "state.npz")
    cursor = 0
    tallies = {"accepted": np.zeros(2, np.int64),
               "total": np.int64(0)}
    if os.path.exists(ckpt):
        _idx, _panel, t = checkpoint.load_index(ckpt)
        cursor = int(t["cursor"])
        tallies = {"accepted": t["accepted"].astype(np.int64),
                   "total": np.int64(t["total"])}
        print("resumed at cursor %d" % cursor, flush=True)

    eng, idx, panel = build_engine()

    def die(tag):
        print("CRASH %s" % tag, flush=True)
        sys.stdout.flush()
        os._exit(9)

    n_batches = 0
    for i, rb in enumerate(batches_from_fastq(fastq, BATCH, READ_LEN)):
        n_batches = i + 1
        if i < cursor:
            continue          # durable already; do NOT recompute
        d, best, est, nhits = (np.asarray(x) for x in eng(rb.codes)[:4])
        rows = "".join(
            "%s\t%d\t%d\t%d\t%d\n"
            % (rb.ids[j], int(d[j]), int(best[j]), int(est[j]),
               int(nhits[j]))
            for j in range(rb.count))
        print("batch %d computed" % i, flush=True)
        part = os.path.join(workdir, "part.%05d" % i)
        tmp = part + ".tmp"
        data = rows.encode()
        with open(tmp, "wb") as f:
            if crash_kind == "mid_part" and i == crash_i:
                f.write(data[:len(data) // 2])
                f.flush()
                os.fsync(f.fileno())
                die("mid_part:%d" % i)
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, part)
        if crash_kind == "after_part" and i == crash_i:
            die("after_part:%d" % i)
        tallies = {
            "accepted": tallies["accepted"]
            + np.bincount(best[:rb.count], weights=d[:rb.count],
                          minlength=2).astype(np.int64),
            "total": np.int64(int(tallies["total"]) + rb.count),
            "cursor": np.int64(i + 1),
        }
        tmpc = ckpt + ".tmp.npz"
        checkpoint.save_index(tmpc, idx, panel, tallies)
        os.replace(tmpc, ckpt)
        del tallies["cursor"]
        if crash_kind == "after_ckpt" and i == crash_i:
            die("after_ckpt:%d" % i)

    out = os.path.join(workdir, "decisions.tsv")
    with open(out + ".tmp", "wb") as f:
        for i in range(n_batches):
            with open(os.path.join(workdir, "part.%05d" % i), "rb") as p:
                f.write(p.read())
    os.replace(out + ".tmp", out)
    print("tallies accepted=%s total=%d"
          % (tallies["accepted"].tolist(), int(tallies["total"])),
          flush=True)
    print("DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
