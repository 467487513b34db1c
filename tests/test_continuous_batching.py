"""Continuous batching tests: per-slot decode correctness vs the batch
engine, staggered admission, SSE streaming (reference: deploy dynamic
batching, SURVEY §2.7)."""

import http.client
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.models.llm.config import tiny_test
from nemo_tpu.models.llm.gpt import GPTModel
from nemo_tpu.models.llm.generate import (
    ContinuousBatchingEngine,
    GenerationEngine,
    SamplingParams,
)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test()
    model = GPTModel(cfg)
    import flax.linen as nn
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    params = nn.meta.unbox(variables["params"])
    return cfg, params


def _run_continuous(cfg, params, prompts, max_new, stagger=False,
                    cache_dtype=None):
    kw = {"cache_dtype": cache_dtype} if cache_dtype is not None else {}
    eng = ContinuousBatchingEngine(cfg, params, max_slots=4, max_len=64,
                                   prefill_buckets=(8, 16), **kw)
    outs = {i: [] for i in range(len(prompts))}
    slots = {}
    feed = np.zeros(4, np.int32)
    pending = list(enumerate(prompts))
    produced = {i: 0 for i in range(len(prompts))}
    step = 0
    while pending or slots:
        # admit one per iteration when staggering, else all at once
        while pending and len(slots) < 4:
            i, p = pending.pop(0)
            s = min(set(range(4)) - set(slots.keys()))
            tok = eng.prefill_slot(s, p)
            slots[s] = i
            feed[s] = tok
            outs[i].append(tok)
            produced[i] += 1
            if stagger:
                break
        active = np.asarray([s in slots for s in range(4)])
        if not active.any():
            continue
        nxt = eng.decode_step(feed, active)
        step += 1
        for s in list(slots.keys()):
            i = slots[s]
            if produced[i] >= max_new:
                del slots[s]
                eng.free_slot(s)
                feed[s] = 0
                continue
            feed[s] = nxt[s]
            outs[i].append(int(nxt[s]))
            produced[i] += 1
        for s in list(slots.keys()):
            i = slots[s]
            if produced[i] >= max_new:
                del slots[s]
                eng.free_slot(s)
                feed[s] = 0
    return [outs[i][:max_new] for i in range(len(prompts))]


def test_continuous_matches_batch_engine(setup):
    cfg, params = setup
    rng = np.random.RandomState(0)
    prompts = [list(rng.randint(1, 100, n)) for n in (5, 9, 3)]
    max_new = 6
    ref = GenerationEngine(cfg, params, cache_dtype=jnp.float32).generate_tokens(
        prompts, SamplingParams(greedy=True, max_new_tokens=max_new, eos_id=-1))
    cont = _run_continuous(cfg, params, prompts, max_new)
    assert cont == ref


def test_decode_steps_matches_single_steps(setup):
    """decode_steps (N tokens per dispatch, one jitted scan) must produce
    EXACTLY the per-token decode_step greedy stream — same caches, same
    cur_len evolution."""
    cfg, params = setup
    rng = np.random.RandomState(5)
    prompts = [list(rng.randint(1, 100, n)) for n in (5, 9)]

    def admit(eng):
        feed = np.zeros(2, np.int32)
        for s, p in enumerate(prompts):
            feed[s] = eng.prefill_slot(s, p)
        return feed

    e1 = ContinuousBatchingEngine(cfg, params, max_slots=2, max_len=64,
                                  prefill_buckets=(8, 16))
    feed = admit(e1)
    active = np.ones(2, bool)
    single = []
    cur = feed.copy()
    for i in range(6):
        cur = e1.decode_step(cur, active, seed=i)
        single.append(cur.copy())

    e2 = ContinuousBatchingEngine(cfg, params, max_slots=2, max_len=64,
                                  prefill_buckets=(8, 16))
    feed2 = admit(e2)
    toks, emitted, act = e2.decode_steps(feed2, active, n_steps=6)
    assert emitted.all() and act.all()
    assert [list(r) for r in toks] == [list(r) for r in single]
    assert list(e2.cur_len) == list(e1.cur_len)  # both advanced 6 from prefill


def test_decode_steps_eos_freezes_slot(setup):
    """On-device EOS: once a slot samples its eos_id it stops advancing —
    emitted goes False, cur_len freezes, the other slot continues."""
    cfg, params = setup
    rng = np.random.RandomState(6)
    prompts = [list(rng.randint(1, 100, n)) for n in (5, 7)]
    eng = ContinuousBatchingEngine(cfg, params, max_slots=2, max_len=64,
                                   prefill_buckets=(8,))
    feed = np.zeros(2, np.int32)
    for s, p in enumerate(prompts):
        feed[s] = eng.prefill_slot(s, p)
    active = np.ones(2, bool)
    # find what slot 0 would greedily emit at step 0, then declare THAT
    # token its eos: the whole rest of its stream must freeze
    probe = ContinuousBatchingEngine(cfg, params, max_slots=2, max_len=64,
                                     prefill_buckets=(8,))
    for s, p in enumerate(prompts):
        probe.prefill_slot(s, p)
    first = probe.decode_step(feed, active, seed=0)
    eos = np.asarray([first[0], -1], np.int32)
    len_before = eng.cur_len.copy()
    toks, emitted, act = eng.decode_steps(feed, active, n_steps=5, eos_id=eos)
    assert toks[0, 0] == first[0] and emitted[0, 0]
    assert not emitted[1:, 0].any()          # slot 0 froze after eos
    assert emitted[:, 1].all() and act[1]    # slot 1 ran all 5 steps
    assert not act[0]
    assert eng.cur_len[0] == len_before[0] + 1
    assert eng.cur_len[1] == len_before[1] + 5


def test_decode_steps_kv_bucketing_exact(setup):
    """KV length bucketing (scan on a static prefix slice of the cache
    pool, write-back at dispatch end) must be bit-exact vs the full pool,
    including across a bucket-boundary crossing and with int8 caches."""
    cfg, params = setup
    rng = np.random.RandomState(7)
    prompts = [list(rng.randint(1, 100, n)) for n in (5, 9)]

    def drive(kvb, cache_dtype, split):
        eng = ContinuousBatchingEngine(cfg, params, max_slots=2, max_len=64,
                                       prefill_buckets=(8, 16),
                                       kv_len_buckets=kvb,
                                       cache_dtype=cache_dtype)
        feed = np.zeros(2, np.int32)
        for s, p in enumerate(prompts):
            feed[s] = eng.prefill_slot(s, p)
        active = np.ones(2, bool)
        out = []
        for n in split:
            toks, emitted, _ = eng.decode_steps(feed, active, n_steps=n)
            assert emitted.all()
            out.extend(list(r) for r in toks)
            feed = toks[-1].copy()
        return out

    for dt in (jnp.bfloat16, jnp.int8):
        full = drive((64,), dt, (8,))
        bucketed = drive((16, 32), dt, (8,))       # sliced scan, one dispatch
        crossing = drive((8, 16, 32), dt, (4, 4))  # bucket grows mid-stream
        assert bucketed == full
        assert crossing == full


def test_server_decode_chunk_matches_unchunked():
    """LLMServer with decode_chunk>1 must stream the same greedy tokens as
    the per-token scheduler (budget-capped chunks, no overshoot)."""
    from nemo_tpu.serve.openai_server import LLMServer, SamplingParams as SP

    class ByteTok:
        def text_to_ids(self, t):
            return [b % 120 for b in t.encode()] or [1]

        def ids_to_text(self, ids):
            return bytes(max(32, min(126, i + 32)) for i in ids).decode(errors="replace")

    cfg = tiny_test()
    model = GPTModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    outs = {}
    for chunk in (1, 4):
        srv = LLMServer(cfg, variables["params"], ByteTok(), max_slots=2,
                        max_len=64, decode_chunk=chunk)
        srv._worker.start()
        try:
            outs[chunk] = srv.submit(
                "hello world", SP(greedy=True, max_new_tokens=7, eos_id=-1))
        finally:
            srv.shutdown()
    assert outs[1] == outs[4] and len(outs[1]) > 0


def test_continuous_staggered_admission(setup):
    """Requests joining mid-decode must not perturb earlier slots."""
    cfg, params = setup
    rng = np.random.RandomState(1)
    prompts = [list(rng.randint(1, 100, n)) for n in (4, 7)]
    ref = _run_continuous(cfg, params, prompts, 5, stagger=False)
    stag = _run_continuous(cfg, params, prompts, 5, stagger=True)
    assert stag == ref


def test_sse_streaming():
    from nemo_tpu.serve.openai_server import LLMServer

    class ByteTok:
        def text_to_ids(self, t):
            return [b % 120 for b in t.encode()] or [1]

        def ids_to_text(self, ids):
            return bytes(max(32, min(126, i + 32)) for i in ids).decode(errors="replace")

    cfg = tiny_test()
    model = GPTModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    srv = LLMServer(cfg, variables["params"], ByteTok(), max_slots=2, max_len=64)
    srv.serve(port=18127, blocking=False)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", 18127, timeout=240)
        conn.request("POST", "/v1/chat/completions", json.dumps({
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 4, "stream": True}),
            {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200
        assert "text/event-stream" in r.getheader("Content-Type", "")
        body = r.read().decode()
        events = [l for l in body.split("\n\n") if l.startswith("data: ")]
        assert events[-1] == "data: [DONE]"
        deltas = [json.loads(e[6:]) for e in events[:-1]]
        assert len(deltas) >= 1
        assert all("delta" in d["choices"][0] for d in deltas)
    finally:
        srv.shutdown()


def test_per_slot_temperature_isolation(setup):
    """ADVICE r2: a greedy (temperature=0) request co-scheduled with a
    temperature=1.0 request must still decode deterministically greedy."""
    cfg, params = setup
    rng = np.random.RandomState(3)
    p_greedy = list(rng.randint(1, cfg.vocab_size, 6))
    p_hot = list(rng.randint(1, cfg.vocab_size, 6))

    def run(pair):
        eng = ContinuousBatchingEngine(cfg, params, max_slots=4, max_len=64,
                                       prefill_buckets=(8,))
        feed = np.zeros(4, np.int32)
        temps = np.zeros(4, np.float32)
        out = []
        tok = eng.prefill_slot(0, p_greedy, temperature=0.0, seed=0)
        feed[0] = tok
        out.append(tok)
        active = np.asarray([True, False, False, False])
        if pair:
            temps[1] = 1.0
            feed[1] = eng.prefill_slot(1, p_hot, temperature=1.0, seed=0)
            active[1] = True
        for step in range(8):
            nxt = eng.decode_step(feed, active, temps, seed=step)
            feed = np.where(active, nxt, feed).astype(np.int32)
            out.append(int(nxt[0]))
        return out

    solo = run(pair=False)
    paired = run(pair=True)
    assert solo == paired, (solo, paired)


def test_temp_sample_per_row_topk_topp():
    """_temp_sample supports per-row top_k/top_p vectors: a top_k=1 row is
    argmax regardless of temperature; a tiny-top_p row collapses to argmax;
    disabled rows (0) sample the full distribution."""
    from nemo_tpu.models.llm.generate import _temp_sample

    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(4, 50).astype(np.float32) * 3)
    temps = np.asarray([1.0, 1.0, 0.0, 1.0], np.float32)
    top_k = np.asarray([1, 0, 0, 0], np.int32)
    top_p = np.asarray([0.0, 1e-6, 0.0, 0.0], np.float32)
    amax = np.argmax(np.asarray(logits), -1)
    hits = np.zeros(4)
    draws = []
    for seed in range(24):
        out = np.asarray(_temp_sample(logits, jax.random.PRNGKey(seed),
                                      temps, top_k, top_p))
        assert out[0] == amax[0]          # top_k=1 → argmax
        assert out[1] == amax[1]          # top_p→0 → argmax
        assert out[2] == amax[2]          # temperature 0 → greedy
        draws.append(out[3])
    assert len(set(draws)) > 1            # unrestricted row actually samples


def test_per_slot_topp_isolation(setup):
    """A top_k=1 sampled request co-scheduled with an unrestricted
    temperature=1.0 request decodes exactly like running alone."""
    cfg, params = setup
    rng = np.random.RandomState(5)
    p_a = list(rng.randint(1, cfg.vocab_size, 6))
    p_b = list(rng.randint(1, cfg.vocab_size, 6))

    def run(pair):
        eng = ContinuousBatchingEngine(cfg, params, max_slots=4, max_len=64,
                                       prefill_buckets=(8,))
        feed = np.zeros(4, np.int32)
        temps = np.zeros(4, np.float32)
        tks = np.zeros(4, np.int32)
        temps[0], tks[0] = 1.0, 1          # sampled but top_k=1 == argmax
        out = [eng.prefill_slot(0, p_a, temperature=1.0, seed=0, top_k=1)]
        feed[0] = out[0]
        active = np.asarray([True, False, False, False])
        if pair:
            temps[1] = 1.0
            feed[1] = eng.prefill_slot(1, p_b, temperature=1.0, seed=0)
            active[1] = True
        for step in range(8):
            nxt = eng.decode_step(feed, active, temps, seed=step, top_k=tks)
            feed = np.where(active, nxt, feed).astype(np.int32)
            out.append(int(nxt[0]))
        return out

    assert run(pair=False) == run(pair=True)


def test_chunked_prefill_matches_single_shot(setup):
    """A prompt longer than the largest prefill bucket runs as chunked
    prefill and must match a single-shot prefill exactly (greedy)."""
    cfg, params = setup
    rng = np.random.RandomState(11)
    prompt = list(rng.randint(1, cfg.vocab_size, 20))

    def run(buckets):
        eng = ContinuousBatchingEngine(cfg, params, max_slots=2, max_len=64,
                                       prefill_buckets=buckets)
        toks = [eng.prefill_slot(0, prompt)]
        feed = np.zeros(2, np.int32)
        feed[0] = toks[0]
        active = np.asarray([True, False])
        for step in range(6):
            nxt = eng.decode_step(feed, active)
            toks.append(int(nxt[0]))
            feed[0] = nxt[0]
        return toks

    single = run((32,))
    chunked = run((8,))   # 20-token prompt → chunks of 8, 8, 4
    assert single == chunked, (single, chunked)


def test_prefix_cache_exactness_and_lru(setup):
    """register_prefix + prefill == vanilla prefill (greedy, token-exact);
    the store is LRU-bounded."""
    cfg, params = setup
    rng = np.random.RandomState(12)
    prefix = list(rng.randint(1, cfg.vocab_size, 8))
    suffix = list(rng.randint(1, cfg.vocab_size, 5))
    prompt = prefix + suffix

    def run(use_prefix):
        eng = ContinuousBatchingEngine(cfg, params, max_slots=2, max_len=64,
                                       prefill_buckets=(8, 16),
                                       max_prefixes=2)
        if use_prefix:
            eng.register_prefix(prefix)
        toks = [eng.prefill_slot(0, prompt)]
        assert eng.cur_len[0] == len(prompt)
        feed = np.zeros(2, np.int32)
        feed[0] = toks[0]
        active = np.asarray([True, False])
        for step in range(6):
            nxt = eng.decode_step(feed, active)
            toks.append(int(nxt[0]))
            feed[0] = nxt[0]
        return eng, toks

    _, vanilla = run(False)
    eng, cached = run(True)
    assert vanilla == cached, (vanilla, cached)
    # LRU bound: registering 2 more prefixes evicts the oldest
    eng.register_prefix(prefix[:4])
    eng.register_prefix(list(rng.randint(1, cfg.vocab_size, 6)))
    assert len(eng._prefix_store) == 2
    assert tuple(prefix) not in eng._prefix_store


def test_int8_kv_cache_generation(setup):
    """int8 KV cache (vLLM kv_cache_dtype=int8 analog): greedy decode with a
    quantized cache stays close to the f32-cache reference — logits-level
    quantization noise only, structure (shape/eos handling) identical."""
    cfg, params = setup
    rng = np.random.RandomState(2)
    prompts = [list(rng.randint(1, 100, n)) for n in (5, 9)]
    p = SamplingParams(greedy=True, max_new_tokens=6, eos_id=-1)
    ref = GenerationEngine(cfg, params, cache_dtype=jnp.float32).generate_tokens(prompts, p)
    q = GenerationEngine(cfg, params, cache_dtype=jnp.int8).generate_tokens(prompts, p)
    assert [len(o) for o in q] == [len(o) for o in ref]
    # untrained logits are near-ties; require a majority token agreement
    agree = np.mean([a == b for r, s in zip(ref, q) for a, b in zip(r, s)])
    assert agree >= 0.5, (agree, ref, q)


def test_int8_kv_cache_continuous_with_prefix(setup):
    """Continuous batching + chunked prefill + prefix cache all run on an
    int8 cache pool; slots stay independent."""
    cfg, params = setup
    eng = ContinuousBatchingEngine(cfg, params, max_slots=2, max_len=64,
                                   prefill_buckets=(8,), cache_dtype=jnp.int8)
    prefix = [7, 8, 9, 10]
    eng.register_prefix(prefix)
    t0 = eng.prefill_slot(0, prefix + [11, 12])  # hits the cached prefix
    t1 = eng.prefill_slot(1, [3, 4, 5])
    feed = np.asarray([t0, t1], np.int32)
    active = np.ones(2, bool)
    for i in range(4):
        feed = eng.decode_step(feed, active, seed=i)
    assert feed.shape == (2,)
    # prefix path == no-prefix path on the same int8 pool
    eng2 = ContinuousBatchingEngine(cfg, params, max_slots=2, max_len=64,
                                    prefill_buckets=(8,), cache_dtype=jnp.int8)
    t0b = eng2.prefill_slot(0, prefix + [11, 12])
    assert t0b == t0


def test_server_quantized_flags(setup):
    """LLMServer(quantize_weights=True, quantize_kv_cache=True) serves an
    int8-resident engine end-to-end."""
    from nemo_tpu.serve.openai_server import LLMServer, SamplingParams as SP

    class ByteTok:
        def text_to_ids(self, t):
            return [b % 120 for b in t.encode()] or [1]

        def ids_to_text(self, ids):
            return bytes(max(32, min(126, i + 32)) for i in ids).decode(errors="replace")

    cfg, params = setup
    srv = LLMServer(cfg, params, ByteTok(), max_slots=2, max_len=64,
                    quantize_weights=True, quantize_kv_cache=True)
    assert srv.engine.cfg.quantization == "int8_ptq"
    srv._worker.start()
    try:
        out = srv.submit("hello", SP(max_new_tokens=4))
        assert isinstance(out, str) and len(out) > 0
    finally:
        srv.shutdown()


def test_sharded_continuous_batching(setup):
    """TP/FSDP-sharded continuous batching equals the unsharded engine
    (greedy, staggered slots) on the 8-virtual-device mesh."""
    from nemo_tpu.parallel.mesh import MeshConfig

    cfg, params = setup
    rng = np.random.RandomState(7)
    prompts = [list(rng.randint(1, 100, n)) for n in (5, 9, 3)]
    ref = _run_continuous(cfg, params, prompts, 5, cache_dtype=jnp.float32)

    def run_sharded(prompts, max_new):
        eng = ContinuousBatchingEngine(
            cfg, params, max_slots=4, max_len=64, prefill_buckets=(8, 16),
            cache_dtype=jnp.float32, mesh_cfg=MeshConfig(tp=2, fsdp=2))
        outs = []
        feed = np.zeros(4, np.int32)
        for i, p in enumerate(prompts):
            t = eng.prefill_slot(i, p)
            outs.append([t])
            feed[i] = t
        active = np.asarray([i < len(prompts) for i in range(4)])
        for _ in range(max_new - 1):
            nxt = eng.decode_step(feed, active)
            for i in range(len(prompts)):
                outs[i].append(int(nxt[i]))
                feed[i] = nxt[i]
        return outs

    got = run_sharded(prompts, 5)
    assert got == ref


def test_unaligned_prefix_chunk_write_no_overrun(setup):
    """A cached prefix leaves the remainder chunk's write start unaligned;
    if its PADDED bucket extends past the pool end, dynamic_update_slice
    clamps the start back and silently overwrites prefix KV rows (row 96
    of a 128 pool at P=106 + bucket 32 — the round-5 regression). The
    prefix path must stay token-exact vs plain prefill."""
    cfg, params = setup
    rng = np.random.RandomState(11)
    prompt = list(rng.randint(1, 100, 112))
    prefix = prompt[:106]

    def run(register):
        eng = ContinuousBatchingEngine(
            cfg, params, max_slots=2, max_len=512,
            cache_dtype=jnp.float32)
        if register:
            eng.register_prefix(prefix)
        t = eng.prefill_slot(0, prompt)
        toks, _, _ = eng.decode_steps(
            np.array([t, 0]), np.array([True, False]), n_steps=4)
        return [t] + [int(x) for x in toks[:, 0]]

    assert run(True) == run(False)
