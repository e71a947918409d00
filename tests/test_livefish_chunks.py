"""Chunk-by-chunk (read-until) decision engine + replay harness."""

import numpy as np
import pytest

from cornetto_tpu.kernels.minimizer import encode_seq
from cornetto_tpu.livefish.chunks import (PROCEED, STOP_RECEIVING, UNBLOCK,
                                          ChunkDecisionEngine, ChunkEvent,
                                          ChunkPolicy, DeviceChunkEngine,
                                          replay_read_until)
from cornetto_tpu.livefish.decide import SingleChipEngine
from cornetto_tpu.livefish.index import build_index, build_panel_mask

BASES = np.array(list("ACGT"))


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(42)
    genome = {
        "ctgA": "".join(BASES[rng.integers(0, 4, 60000)]),
        "ctgB": "".join(BASES[rng.integers(0, 4, 40000)]),
    }
    panel_rows = [("ctgA", 20000, 40000)]
    idx = build_index(genome, n_shards=1)
    panel = build_panel_mask(idx, panel_rows)
    eng = SingleChipEngine(idx, panel)
    return genome, panel_rows, eng


def test_incremental_decisions(setup):
    genome, _, eng = setup
    ce = ChunkDecisionEngine(eng, n_channels=8, chunk_len=200,
                             policy=ChunkPolicy(max_chunks=4), batch=8)
    # channel 0: read from the boring panel -> unblock on chunk 1
    s = genome["ctgA"][25000:26600]
    d = ce.process([ChunkEvent(0, "r0", s[:200])])
    assert len(d) == 1 and d[0].action == UNBLOCK and d[0].n_chunks == 1
    # channel 1: read from fun region -> stop_receiving
    s1 = genome["ctgA"][45000:46600]
    d = ce.process([ChunkEvent(1, "r1", s1[:200])])
    assert d[0].action == STOP_RECEIVING
    # decided channels are silent for further chunks of the same read
    d = ce.process([ChunkEvent(0, "r0", s[200:400]),
                    ChunkEvent(1, "r1", s1[200:400])])
    assert d == []
    # a NEW read on channel 0 resets state and decides again
    d = ce.process([ChunkEvent(0, "r2", genome["ctgB"][100:300])])
    assert d[0].action == STOP_RECEIVING and d[0].n_chunks == 1


def test_random_reads_proceed_then_give_up(setup):
    _, _, eng = setup
    rng = np.random.default_rng(1)
    junk = "".join(BASES[rng.integers(0, 4, 1000)])
    ce = ChunkDecisionEngine(eng, n_channels=4, chunk_len=200,
                             policy=ChunkPolicy(max_chunks=3,
                                                no_map_action=UNBLOCK),
                             batch=4)
    acts = []
    for t in range(3):
        d = ce.process([ChunkEvent(0, "rx", junk[t * 200:(t + 1) * 200])])
        acts.append(d[0].action if d else None)
    assert acts[0] == PROCEED and acts[1] == PROCEED
    assert acts[2] == UNBLOCK  # gave up at max_chunks with unblock policy


def test_short_first_chunk_accumulates(setup):
    """A chunk shorter than needed for confident mapping proceeds, then the
    accumulated prefix decides."""
    genome, _, eng = setup
    # 24-bp chunks: one chunk holds a single minimizer window (m = 10
    # k-mer positions) — far below min_hits, so the first decision MUST
    # come from accumulated chunks
    ce = ChunkDecisionEngine(eng, n_channels=2, chunk_len=24,
                             policy=ChunkPolicy(max_chunks=8), batch=2)
    s = genome["ctgA"][25000:25400]
    acts = []
    for t in range(8):
        d = ce.process([ChunkEvent(0, "r0", s[t * 24:(t + 1) * 24])])
        if d:
            acts.append(d[0].action)
            if d[0].action != PROCEED:
                break
    assert acts[-1] == UNBLOCK
    assert len(acts) >= 2      # needed more than one 40-bp chunk


def test_chunks_over_sharded_engine(setup):
    """The chunk state machine runs unchanged over the dp/ep-sharded
    engine (its decide_packed attribute) and agrees with the single-chip
    engine's actions."""
    import jax
    from jax.sharding import Mesh
    from cornetto_tpu.livefish.decide import make_sharded_engine
    from cornetto_tpu.livefish.index import build_index, build_panel_mask
    genome, panel_rows, eng1 = setup
    devices = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devices, ("dp", "ep"))
    idxE = build_index(genome, n_shards=2)
    panel = build_panel_mask(idxE, panel_rows)
    engE = make_sharded_engine(mesh, idxE, panel)
    ce1 = ChunkDecisionEngine(eng1, n_channels=4, chunk_len=200, batch=4)
    ceE = ChunkDecisionEngine(engE, n_channels=4, chunk_len=200, batch=4)
    s_boring = genome["ctgA"][25000:25800]
    s_fun = genome["ctgA"][45000:45800]
    for t in range(4):
        ev = [ChunkEvent(0, "rb", s_boring[t * 200:(t + 1) * 200]),
              ChunkEvent(1, "rf", s_fun[t * 200:(t + 1) * 200])]
        d1 = {(d.channel, d.action) for d in ce1.process(ev)}
        dE = {(d.channel, d.action) for d in ceE.process(ev)}
        assert d1 == dE
    assert ce1._done[0] and ce1._done[1]


def test_replay_metrics(setup):
    genome, panel_rows, eng = setup
    rng = np.random.default_rng(9)
    reads = []
    for i in range(20):   # panel-origin reads (should be unblocked)
        s = int(rng.integers(21000, 38000 - 1600))
        reads.append(("b%d" % i, genome["ctgA"][s:s + 1600], True))
    for i in range(20):   # fun-region reads (should run to completion)
        s = int(rng.integers(42000, 58000 - 1600))
        reads.append(("f%d" % i, genome["ctgA"][s:s + 1600], False))
    rng.shuffle(reads)
    ce = ChunkDecisionEngine(eng, n_channels=8, chunk_len=200,
                             policy=ChunkPolicy(max_chunks=4), batch=8)
    m = replay_read_until(ce, reads, unblock_overhead=100)
    assert m.n_reads == 40
    assert m.true_reject == 20 and m.false_reject == 0
    assert m.n_stop_receiving == 20
    # adaptive sampling must actually save bases: unblocked reads cost
    # ~1 chunk + overhead instead of 1600
    assert m.bases_sequenced < m.bases_without_as
    saved = 1 - m.bases_sequenced / m.bases_without_as
    assert saved > 0.3
    assert m.mean_decision_chunks <= 2.0


def test_pipelined_decisions_lag_then_land(setup):
    """pipeline_depth=2: decisions surface two ticks late (the host never
    blocks while <=2 batches are in flight) but are identical to the sync
    engine's, and drain() flushes the tail."""
    genome, _, eng = setup
    ce = ChunkDecisionEngine(eng, n_channels=8, chunk_len=200,
                             policy=ChunkPolicy(max_chunks=6), batch=8,
                             pipeline_depth=2)
    s = genome["ctgA"][25000:26600]       # panel read -> unblock
    d1 = ce.process([ChunkEvent(0, "r0", s[:200])])
    assert d1 == [] and len(ce._inflight) == 1
    d2 = ce.process([ChunkEvent(0, "r0", s[200:400])])
    assert d2 == [] and len(ce._inflight) == 2
    # third tick exceeds the depth: the FIRST batch's decision lands now
    d3 = ce.process([ChunkEvent(0, "r0", s[400:600])])
    assert [x.action for x in d3] == [UNBLOCK]
    assert d3[0].n_chunks == 1            # decided on the chunk-1 prefix
    # the two newer in-flight batches re-decide the same read: suppressed
    assert ce.drain() == []
    assert ce._inflight == []


def test_pipelined_late_decision_dropped_on_new_read(setup):
    """A decision that resolves after its channel moved to a new read is
    dropped (matches a real sequencer, where the unblock would no-op)."""
    genome, _, eng = setup
    ce = ChunkDecisionEngine(eng, n_channels=4, chunk_len=200, batch=4,
                             pipeline_depth=4)
    s = genome["ctgA"][25000:25800]
    assert ce.process([ChunkEvent(0, "old", s[:200])]) == []
    # channel 0 starts a NEW read before the old decision ever resolved
    assert ce.process([ChunkEvent(0, "new", genome["ctgB"][100:300])]) == []
    acts = {d.read_id: d.action for d in ce.drain()}
    assert "old" not in acts              # stale decision dropped
    assert acts == {"new": STOP_RECEIVING}


def _mk_reads(genome, n_each=15, rlen=1600, seed=9):
    rng = np.random.default_rng(seed)
    reads = []
    for i in range(n_each):   # panel-origin (boring) reads
        s = int(rng.integers(21000, 38000 - rlen))
        reads.append(("b%d" % i, genome["ctgA"][s:s + rlen], True))
    for i in range(n_each):   # fun-region reads
        s = int(rng.integers(42000, 58000 - rlen))
        reads.append(("f%d" % i, genome["ctgA"][s:s + rlen], False))
    rng.shuffle(reads)
    return reads


def test_device_chunk_engine_matches_host_engine(setup):
    """DeviceChunkEngine (per-channel state on device, only new chunk
    bytes uploaded per tick) emits decisions identical to the
    host-prefix ChunkDecisionEngine across a whole replay."""
    genome, _, eng = setup
    reads = _mk_reads(genome)
    pol = ChunkPolicy(max_chunks=4, no_map_action=UNBLOCK)
    decs = {}
    for cls in (ChunkDecisionEngine, DeviceChunkEngine):
        ce = cls(eng, n_channels=8, chunk_len=200, policy=pol, batch=8)
        got = []
        # drive both engines through identical event sequences
        queue = list(reads)
        active = {}
        for c in range(8):
            if queue:
                active[c] = [queue.pop(0), 0]
        while active:
            events = []
            for c, (rd, off) in list(active.items()):
                rid, seq, _ = rd
                if off < len(seq):
                    events.append(ChunkEvent(c, rid,
                                             seq[off:off + 200]))
                    active[c][1] = off + 200
                else:
                    if queue:
                        active[c] = [queue.pop(0), 0]
                    else:
                        del active[c]
            if not events and not active:
                break
            for d in ce.process(events):
                got.append((d.read_id, d.action, d.n_chunks,
                            d.contig, d.pos, d.nhits))
        got.extend((d.read_id, d.action, d.n_chunks, d.contig, d.pos,
                    d.nhits) for d in ce.drain())
        decs[cls.__name__] = sorted(got)
    assert decs["DeviceChunkEngine"] == decs["ChunkDecisionEngine"]
    assert len(decs["DeviceChunkEngine"]) >= 25


def test_device_two_chunks_one_call_across_batches(setup):
    """Round-3 advisor finding (chunks.py): one channel contributing TWO
    chunks in a single process() call, with batch=1 forcing them into
    separate device batches, must decide identically to the host-state
    engine — the pending tuples carry POST-WRITE lengths, so batch 0's
    decision cannot see batch 1's scattered bytes."""
    genome, _, eng = setup
    s = genome["ctgA"][45000:45800]      # fun region, maps
    pol = ChunkPolicy(max_chunks=4)
    outs = {}
    for cls in (ChunkDecisionEngine, DeviceChunkEngine):
        ce = cls(eng, n_channels=4, chunk_len=200, policy=pol, batch=1)
        ds = ce.process([ChunkEvent(2, "rA", s[:200]),
                         ChunkEvent(2, "rA", s[200:400]),
                         ChunkEvent(3, "rB", s[400:600])])
        ds += ce.drain()
        outs[cls.__name__] = sorted(
            (d.read_id, d.action, d.n_chunks, d.contig, d.pos, d.nhits)
            for d in ds)
    assert outs["DeviceChunkEngine"] == outs["ChunkDecisionEngine"]
    # both chunks really were decided (n_chunks reaches 2 on channel 2)
    assert any(t[0] == "rA" and t[2] == 2
               for t in outs["DeviceChunkEngine"])


def test_device_chunk_engine_replay_and_reset(setup):
    """Replay harness runs unchanged over DeviceChunkEngine; channel
    recycling (stale device slots masked by lengths) keeps rejections
    exact."""
    genome, _, eng = setup
    reads = _mk_reads(genome, n_each=20)
    ce = DeviceChunkEngine(eng, n_channels=8, chunk_len=200,
                           policy=ChunkPolicy(max_chunks=4), batch=8)
    m = replay_read_until(ce, reads, unblock_overhead=100)
    assert m.n_reads == 40
    assert m.true_reject == 20 and m.false_reject == 0
    assert m.n_stop_receiving == 20


def test_device_chunk_engine_pipelined(setup):
    """pipeline_depth > 0 exercises the re-decide-without-new-data path
    (scatter row = sacrificial pad row)."""
    genome, _, eng = setup
    reads = _mk_reads(genome, n_each=10)
    ce = DeviceChunkEngine(eng, n_channels=8, chunk_len=200,
                           policy=ChunkPolicy(max_chunks=4), batch=8,
                           pipeline_depth=2)
    m = replay_read_until(ce, reads, unblock_overhead=100)
    assert m.n_reads == 20
    assert m.false_reject == 0
    assert m.true_reject >= 8      # latency may let a tail read slip


def test_device_chunk_engine_input_contract(setup):
    _, _, eng = setup
    with pytest.raises(ValueError, match="chunk_len"):
        DeviceChunkEngine(eng, n_channels=2, chunk_len=201)
    ce = DeviceChunkEngine(eng, n_channels=2, chunk_len=200, batch=2)
    with pytest.raises(ValueError, match="non-ACGT"):
        ce.process([ChunkEvent(0, "r0", "ACGTN" * 8)])
    with pytest.raises(ValueError, match="exceeds chunk_len"):
        ce.process([ChunkEvent(1, "r1", "A" * 300)])
    # a short FINAL piece is fine; a follow-up chunk after it is not
    ce.process([ChunkEvent(0, "r2", "ACGT" * 10)])
    with pytest.raises(ValueError, match="short"):
        ce.process([ChunkEvent(0, "r2", "ACGT" * 50)])


def test_cli_replay_state_device_matches_host(setup, tmp_path, capsys):
    """`livefish replay --state device` emits the same savings report as
    the default host-state engine."""
    from cornetto_tpu.dist.checkpoint import save_index
    from cornetto_tpu.livefish import cli as lcli
    from cornetto_tpu.livefish.index import build_index, build_panel_mask
    genome, panel_rows, _ = setup
    idx = build_index(genome, n_shards=1)
    panel = build_panel_mask(idx, panel_rows)
    save_index(str(tmp_path / "idx"), idx, panel_mask=panel)
    fq = tmp_path / "reads.fastq"
    with open(fq, "w") as f:
        for i, (rid, seq, _) in enumerate(_mk_reads(genome, n_each=6)):
            f.write("@%s\n%s\n+\n%s\n" % (rid, seq, "I" * len(seq)))
    reports = {}
    for state in ("host", "device"):
        rc = lcli.main(["replay", str(tmp_path / "idx"), str(fq),
                        "-c", "200", "-n", "4", "--state", state])
        assert rc == 0
        reports[state] = capsys.readouterr().out
    assert reports["device"] == reports["host"]
    assert "unblocked\t" in reports["host"]


def test_replay_pipelined_matches_sync_savings(setup):
    """Replay with a 2-deep pipeline keeps rejecting correctly; savings
    stay in the same band as the synchronous engine (decisions cost up to
    pipeline_depth extra chunks of sequencing)."""
    genome, panel_rows, eng = setup
    rng = np.random.default_rng(9)
    reads = []
    for i in range(20):
        s = int(rng.integers(21000, 38000 - 1600))
        reads.append(("b%d" % i, genome["ctgA"][s:s + 1600], True))
    for i in range(20):
        s = int(rng.integers(42000, 58000 - 1600))
        reads.append(("f%d" % i, genome["ctgA"][s:s + 1600], False))
    rng.shuffle(reads)
    ce = ChunkDecisionEngine(eng, n_channels=8, chunk_len=200,
                             policy=ChunkPolicy(max_chunks=4), batch=8,
                             pipeline_depth=2)
    m = replay_read_until(ce, reads, unblock_overhead=100)
    assert m.n_reads == 40
    assert m.false_reject == 0
    assert m.true_reject >= 18            # latency may let a tail read slip
    assert m.bases_sequenced < m.bases_without_as
    saved = 1 - m.bases_sequenced / m.bases_without_as
    assert saved > 0.2
