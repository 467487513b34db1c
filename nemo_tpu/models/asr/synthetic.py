"""Synthetic tone-coded calibration for ASR decode benchmarking.

Purpose (VERDICT r4 weak #3): a RANDOM-init model decodes degenerately —
a fresh CTC head emits near-empty strings and a fresh RNNT joint either
floods (max_symbols per frame) or, blank-biased, emits nothing — so a
"full transcribe" benchmark times only the iteration floor, not the
prediction-network advance / hypothesis assembly a trained model pays.

The fix mirrors the TTS bench's `fit_synthetic` duration calibration
(tts/fastpitch_model.py:97): briefly train the model on TONE-CODED
utterances — each transcript token renders as a distinct tone segment
spread across the clip — until greedy decode emits a realistic,
time-distributed token stream. The bench then transcribes *held-out*
tone-coded audio and asserts a density floor, measuring the true
trained-regime decode cost (reference harness measures trained models,
transcribe_speech.py:383-496).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def tone_audio(targets: np.ndarray, secs: float, sr: int = 16000,
               rng=None) -> np.ndarray:
    """targets [B, U] int → float32 audio [B, sr·secs]: token k renders as
    a short harmonic burst at a k-specific pitch; bursts are spaced evenly
    so emissions distribute across the whole clip (trained-regime decode
    pattern). Deterministic given (targets, rng)."""
    rng = rng or np.random.RandomState(0)
    B, U = targets.shape
    T = int(sr * secs)
    out = 0.01 * rng.randn(B, T).astype(np.float32)
    seg = T // U
    burst = int(min(0.2 * sr, 0.8 * seg))
    t = np.arange(burst) / sr
    env = np.hanning(burst).astype(np.float32)
    for b in range(B):
        for u in range(U):
            k = int(targets[b, u])
            f0 = 180.0 * (2.0 ** (k / 12.0))  # semitone-spaced pitches
            x = sum((0.6 ** h) * np.sin(2 * np.pi * (h + 1) * f0 * t)
                    for h in range(3))
            s = u * seg + (seg - burst) // 2
            out[b, s:s + burst] += (x * env).astype(np.float32)
    peak = np.abs(out).max(axis=1, keepdims=True) + 1e-6
    return (out / peak).astype(np.float32)


def _ctc_train_step(model, lr: float):
    import optax

    from nemo_tpu.ops.audio import mel_spectrogram

    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(lr))

    @jax.jit
    def step(variables, opt_state, signal, length, targets, target_len):
        def f(v):
            feats, feat_len = mel_spectrogram(
                signal, length, model.mel_cfg, training=False)
            log_probs, enc_len = model.net.apply(
                v, feats, feat_len, train=False)
            return model.loss(log_probs, enc_len, targets, target_len)

        loss, grads = jax.value_and_grad(f)(variables)
        updates, opt_state = tx.update(grads, opt_state, variables)
        return optax.apply_updates(variables, updates), opt_state, loss

    return tx, step


def _split_head(variables):
    """(head, frozen-encoder, rest-of-variables) partition of an ASR
    model's variables tree."""
    params = variables["params"]
    head = {k: v for k, v in params.items() if k != "encoder"}
    frozen = params["encoder"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    return head, frozen, rest


def _head_only_step(model, lr, is_rnnt: bool, chunk: int = 16):
    """Frozen-encoder calibration step: differentiate ONLY the head
    subtrees (CTC decoder / RNNT prediction+joint). A 100M+-param encoder
    does not move off random init in a few hundred steps (chip-verified:
    loss flat at 250 steps, density 0), but the heads over frozen random
    encoder features converge fast — and inference cost, which is what
    the bench times, is identical. Backward through the encoder vanishes
    automatically (no grads requested into it)."""
    import optax

    from nemo_tpu.ops.audio import mel_spectrogram

    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(lr))

    @jax.jit
    def step(variables, opt_state, signal, length, targets, target_len):
        head0, frozen, rest = _split_head(variables)

        def f(head):
            v = {**rest, "params": {**head, "encoder": frozen}}
            if is_rnnt:
                return model.loss_fused(v, signal, length, targets,
                                        target_len, chunk=chunk)
            feats, feat_len = mel_spectrogram(
                signal, length, model.mel_cfg, training=False)
            log_probs, enc_len = model.net.apply(
                v, feats, feat_len, train=False)
            return model.loss(log_probs, enc_len, targets, target_len)

        loss, grads = jax.value_and_grad(f)(head0)
        updates, opt_state = tx.update(grads, opt_state, head0)
        head = optax.apply_updates(head0, updates)
        variables = {**rest, "params": {**head, "encoder": frozen}}
        return variables, opt_state, loss

    def init(variables):
        return tx.init(_split_head(variables)[0])

    return init, step


def fit_synthetic_asr(model, steps: int = 40, batch: int = 8,
                      secs: float = 2.0, utt_tokens: int = 6,
                      vocab_cap: int = 12, lr: float = 3e-4,
                      seed: int = 0, head_only: bool = True) -> float:
    """Brief tone-coded fit of an EncDecCTCModel or EncDecRNNTModel
    (in place). Returns the final loss. vocab_cap bounds the distinct
    token ids used (few pitches → fast convergence). head_only freezes
    the encoder (see _head_only_step) — the reliable mode for large
    models; pass False to train everything (tiny models / tests)."""
    import optax

    rng = np.random.RandomState(seed)
    V = min(len(model.labels), vocab_cap)
    sr = model.sample_rate
    T = int(sr * secs)
    # warmup-cosine: transducer losses need the warmup to escape the
    # all-blank basin (chip/CPU-verified on tiny+large conformers)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, max(steps // 10, 5), max(steps, 10), lr / 30.0)
    is_rnnt = hasattr(model, "blank_id") and hasattr(model, "max_symbols")
    if head_only:
        init, step = _head_only_step(model, sched, is_rnnt, chunk=16)
        opt_state = init(model.variables)
    elif is_rnnt:
        tx, step = model.make_train_step(lr=sched, chunk=16)
        opt_state = tx.init(model.variables)
    else:
        tx, step = _ctc_train_step(model, sched)
        opt_state = tx.init(model.variables)
    lens = jnp.full((batch,), T, jnp.int32)
    tlen = jnp.full((batch,), utt_tokens, jnp.int32)
    loss = float("nan")
    for i in range(steps):
        # tokens 1..V-1 (0 may render near-DC); fixed shapes → one compile
        targets = rng.randint(1, V, (batch, utt_tokens))
        audio = tone_audio(targets, secs, sr, rng)
        model.variables, opt_state, loss = step(
            model.variables, opt_state, jnp.asarray(audio), lens,
            jnp.asarray(targets, jnp.int32), tlen)
    return float(loss)


def _frame_labels(targets: np.ndarray, secs: float, Tprime: int,
                  blank: int, sr: int = 16000) -> np.ndarray:
    """[B, U] targets → [B, T'] per-frame labels for the tone_audio layout
    (token u's burst center maps to its encoder frames; elsewhere blank).
    The planted alignment is KNOWN — tone_audio placed the bursts — so
    calibration can use dense framewise supervision."""
    B, U = targets.shape
    T = int(sr * secs)
    seg = T // U
    burst = int(min(0.2 * sr, 0.8 * seg))
    labels = np.full((B, Tprime), blank, np.int32)
    for u in range(U):
        s = u * seg + (seg - burst) // 2
        c0 = (s + 0.2 * burst) / T * Tprime
        c1 = (s + 0.8 * burst) / T * Tprime
        f0, f1 = int(np.ceil(c0)), max(int(c1), int(np.ceil(c0)) + 1)
        labels[:, f0:f1] = targets[:, u][:, None]
    return labels


def framewise_calibrate(model, steps: int = 150, batch: int = 8,
                        secs: float = 2.0, utt_tokens: int = 4,
                        vocab_cap: int = 12, lr: float = 1e-3,
                        seed: int = 0) -> float:
    """Framewise-CE tone calibration (in place) — the reliable path for
    LARGE encoders. A conformer-large at random init has degenerate final
    features (deep random nets collapse representations), so both full
    CTC fine-tuning (all-blank basin; loss 93→11 then flat, chip-verified)
    and frozen-encoder head fits fail. Here the encoder itself adapts
    under DENSE per-frame supervision on the KNOWN planted alignment — no
    alignment marginalization, no basin.

    CTC models train their own decoder framewise; greedy decode then
    emits the planted tokens. RNNT models train the encoder through a
    throwaway linear probe (discarded — inference is untouched), then fit
    prediction+joint head-only with the transducer loss on the adapted
    encoder. Returns the final framewise CE."""
    import optax

    from nemo_tpu.ops.audio import mel_spectrogram

    rng = np.random.RandomState(seed)
    V = min(len(model.labels), vocab_cap)
    sr = model.sample_rate
    T = int(sr * secs)
    lens = jnp.full((batch,), T, jnp.int32)
    is_rnnt = hasattr(model, "blank_id") and hasattr(model, "max_symbols")
    blank = len(model.labels)  # CTC blank = last index; probe uses it too

    # encoder frame count for this clip length (shape-static)
    probe_sig = jnp.zeros((1, T), jnp.float32)
    feats, feat_len = mel_spectrogram(probe_sig, jnp.full((1,), T, jnp.int32),
                                      model.mel_cfg, training=False)
    if is_rnnt:
        enc, el = model.net.apply(model.variables, feats, feat_len,
                                  method=type(model.net).encode)
        d_enc = enc.shape[-1]
    else:
        lp, el = model.net.apply(model.variables, feats, feat_len)
    Tprime = int(jax.device_get(el)[0])

    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, max(steps // 10, 5), max(steps, 10), lr / 30.0)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(sched))

    if is_rnnt:
        k = jax.random.PRNGKey(seed)
        probe = {"w": jax.random.normal(k, (d_enc, blank + 1),
                                        jnp.float32) * 0.02,
                 "b": jnp.zeros((blank + 1,), jnp.float32)}
        state = (model.variables, probe)
    else:
        state = model.variables
    opt_state = tx.init(state)

    @jax.jit
    def step(state, opt_state, signal, length, labels):
        def f(st):
            sig = signal
            feats, feat_len = mel_spectrogram(sig, length, model.mel_cfg,
                                              training=False)
            if is_rnnt:
                v, pr = st
                enc, _ = model.net.apply(v, feats, feat_len,
                                         method=type(model.net).encode)
                logits = enc.astype(jnp.float32) @ pr["w"] + pr["b"]
                lp = jax.nn.log_softmax(logits, -1)
            else:
                lp, _ = model.net.apply(st, feats, feat_len)
                lp = lp.astype(jnp.float32)
            # loss over the VALID frames only (the array may be padded
            # past enc_len; labels cover exactly Tprime frames)
            lp = lp[:, :labels.shape[1]]
            picked = jnp.take_along_axis(lp, labels[..., None], -1)[..., 0]
            return -jnp.mean(picked)

        loss, grads = jax.value_and_grad(f)(state)
        updates, opt_state = tx.update(grads, opt_state, state)
        return optax.apply_updates(state, updates), opt_state, loss

    loss = float("nan")
    for i in range(steps):
        targets = rng.randint(1, V, (batch, utt_tokens))
        audio = tone_audio(targets, secs, sr, rng)
        labels = _frame_labels(targets, secs, Tprime, blank, sr)
        state, opt_state, loss = step(
            state, opt_state, jnp.asarray(audio), lens,
            jnp.asarray(labels, jnp.int32))
    if is_rnnt:
        model.variables = state[0]  # probe discarded
        # the transducer head still needs fitting on the adapted encoder
        # (more steps HURT: 2x steps converged into the all-blank basin on
        # chip; callers use trim_blank_bias to land the final density)
        fit_synthetic_asr(model, steps=steps, batch=batch, secs=secs,
                          utt_tokens=utt_tokens, vocab_cap=vocab_cap,
                          lr=3e-3, seed=seed + 1, head_only=True)
    else:
        model.variables = state
    return float(loss)


def make_eval_batch(model, batch: int, secs: float, utt_tokens: int,
                    vocab_cap: int = 12, seed: int = 100
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Held-out tone-coded eval audio (targets, int16 PCM audio)."""
    rng = np.random.RandomState(seed)
    V = min(len(model.labels), vocab_cap)
    targets = rng.randint(1, V, (batch, utt_tokens))
    audio = tone_audio(targets, secs, model.sample_rate, rng)
    pcm = (np.clip(audio, -1, 1) * 32767).astype(np.int16)
    return targets, pcm


def trim_blank_bias(model, secs: float, utt_tokens: int,
                    band: Tuple[float, float] = (0.05, 0.15),
                    batch: int = 4, seed: int = 990, iters: int = 9):
    """Bisect a blank-logit offset on the RNNT joint's output bias so
    greedy decode density lands in the trained-regime labels/frame band
    (VERDICT r4 #4: ~0.05–0.15 labels/frame) on HELD-OUT tone audio.

    The briefly-fit joint's emission rate is unstable across fit lengths
    (chip: 150 head steps → 0.027 labels/frame, 300 steps → all-blank);
    a single measured bias trim pins the density so the bench times the
    real greedy loop — prediction-network advance + hypothesis assembly —
    at a realistic rate. Mutates model.variables; returns
    (delta, tokens_per_utt)."""
    _, pcm = make_eval_batch(model, batch, secs, utt_tokens, seed=seed)
    T = int(model.sample_rate * secs)
    lens = jnp.full((batch,), T, jnp.int32)
    sig = jax.device_put(jnp.asarray(pcm))

    # encoder frame count (shape-static) → band in tokens/utt
    from nemo_tpu.ops.audio import mel_spectrogram

    feats, feat_len = mel_spectrogram(
        jnp.zeros((1, T), jnp.float32), jnp.full((1,), T, jnp.int32),
        model.mel_cfg, training=False)
    _, el = model.net.apply(model.variables, feats, feat_len,
                            method=type(model.net).encode)
    Tprime = int(jax.device_get(el)[0])
    lo_tok, hi_tok = band[0] * Tprime, band[1] * Tprime

    base = model.variables
    bias0 = jnp.asarray(
        base["params"]["joint"]["out_proj"]["bias"], jnp.float32)
    blank = model.blank_id

    def with_delta(delta):
        b = bias0.at[blank].add(delta).astype(
            base["params"]["joint"]["out_proj"]["bias"].dtype)
        p = dict(base["params"])
        j = dict(p["joint"])
        op = {**dict(j["out_proj"]), "bias": b}
        p["joint"] = {**j, "out_proj": op}
        return {**base, "params": p}

    def density(delta):
        model.variables = with_delta(delta)
        out = model.transcribe_staged([(sig, lens, batch)])
        return sum(len(s) for s in out) / batch

    d0 = density(0.0)
    if lo_tok <= d0 <= hi_tok:
        model.variables = with_delta(0.0)
        return 0.0, d0
    lo, hi = -14.0, 14.0  # density is monotone DECREASING in delta
    mid, d = 0.0, d0
    for _ in range(iters):
        mid = (lo + hi) / 2
        d = density(mid)
        if d < lo_tok:
            hi = mid
        elif d > hi_tok:
            lo = mid
        else:
            break
    model.variables = with_delta(mid)
    return mid, d
