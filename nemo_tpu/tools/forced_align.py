"""CTC forced alignment: align a known transcript to audio frames.

Reference parity: `tools/ctc_segmentation/` + the NeMo Forced Aligner
(`tools/nemo_forced_aligner/`): given audio and its transcript, produce
per-token / per-word start-end times from a CTC model's log-probs.

TPU-native: the constrained Viterbi over the CTC trellis
(blank-interleaved target states 2U+1) is one `lax.scan` over frames with
a static [2U+1] state lattice — same shape discipline as the losses; the
backtrack runs on host over the stored argmax choices (ints only).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


@dataclass
class TokenSpan:
    token: int
    start_frame: int
    end_frame: int  # exclusive


def ctc_forced_align(
    log_probs: np.ndarray,  # [T, V+1] (blank last unless given)
    targets: Sequence[int],
    blank: Optional[int] = None,
) -> List[TokenSpan]:
    """Viterbi path through the blank-interleaved target lattice →
    per-token frame spans."""
    T, V1 = log_probs.shape
    blank_id = V1 - 1 if blank is None else blank
    y = list(int(t) for t in targets)
    U = len(y)
    S = 2 * U + 1  # blank, y0, blank, y1, …, blank
    labels = np.full(S, blank_id, np.int64)
    labels[1::2] = y

    lp = jnp.asarray(log_probs, jnp.float32)
    lab = jnp.asarray(labels)

    # allowed transitions into state s: from s, s-1, and s-2 (if the skip is
    # legal: s odd-token and different from token two back)
    can_skip = np.zeros(S, bool)
    for s in range(2, S):
        can_skip[s] = (s % 2 == 1) and (labels[s] != labels[s - 2])
    can_skip = jnp.asarray(can_skip)

    alpha0 = jnp.full((S,), NEG_INF).at[0].set(lp[0, blank_id])
    if S > 1:
        alpha0 = alpha0.at[1].set(lp[0, lab[1]])

    def step(alpha, t):
        stay = alpha
        prev1 = jnp.concatenate([jnp.full((1,), NEG_INF), alpha[:-1]])
        prev2 = jnp.concatenate([jnp.full((2,), NEG_INF), alpha[:-2]])
        prev2 = jnp.where(can_skip, prev2, NEG_INF)
        stacked = jnp.stack([stay, prev1, prev2])  # [3, S]
        best = jnp.argmax(stacked, axis=0)  # 0=stay, 1=-1, 2=-2
        val = jnp.max(stacked, axis=0) + lp[t, lab]
        return val, best

    alpha, choices = jax.lax.scan(step, alpha0, jnp.arange(1, T))
    choices = np.asarray(choices)  # [T-1, S]
    alpha = np.asarray(alpha)

    # end at last blank or last token
    s = int(np.argmax(alpha[[S - 1, max(S - 2, 0)]]))
    s = S - 1 - s
    path = [s]
    for t in range(T - 2, -1, -1):
        s = s - int(choices[t, s])
        path.append(s)
    path.reverse()  # [T] state per frame

    spans: List[TokenSpan] = []
    cur_s, start = None, 0
    for t, st in enumerate(path):
        if st % 2 == 1:  # token state
            if cur_s != st:
                if cur_s is not None and cur_s % 2 == 1:
                    spans.append(TokenSpan(int(labels[cur_s]), start, t))
                cur_s, start = st, t
        else:
            if cur_s is not None and cur_s % 2 == 1:
                spans.append(TokenSpan(int(labels[cur_s]), start, t))
            cur_s = st
    if cur_s is not None and cur_s % 2 == 1:
        spans.append(TokenSpan(int(labels[cur_s]), start, T))
    return spans


def align_transcript(
    model,
    audio,  # path or [T] float array
    transcript: str,
    frame_secs: Optional[float] = None,
) -> List[Dict]:
    """Word-level timings from an EncDecCTCModel + transcript (NFA output
    format: [{'word', 'start', 'end'} in seconds])."""
    from nemo_tpu.data.audio_io import read_wav

    if isinstance(audio, str):
        sig, _ = read_wav(audio, target_sr=model.sample_rate)
    else:
        sig = np.asarray(audio, np.float32)
    log_probs, enc_len = model.forward(
        jnp.asarray(sig[None]), jnp.asarray([len(sig)]))
    lp = np.asarray(log_probs[0][: int(enc_len[0])])
    if frame_secs is None:
        frame_secs = (len(sig) / model.sample_rate) / max(int(enc_len[0]), 1)

    # tokenize transcript with the model's labels (char vocab)
    label_to_id = {c: i for i, c in enumerate(model.labels)}
    words = transcript.split()
    token_ids, word_of_token = [], []
    for w_i, w in enumerate(words):
        chars = (" " if w_i > 0 else "") + w
        for ch in chars:
            if ch in label_to_id:
                token_ids.append(label_to_id[ch])
                word_of_token.append(w_i if ch != " " else -1)
    spans = ctc_forced_align(lp, token_ids, blank=model.decoding.blank_id)

    out: List[Dict] = []
    tok_i = 0
    for w_i, w in enumerate(words):
        frames = [s for s, wo in zip(spans, word_of_token) if wo == w_i]
        if not frames:
            continue
        out.append({
            "word": w,
            "start": frames[0].start_frame * frame_secs,
            "end": frames[-1].end_frame * frame_secs,
        })
    return out
