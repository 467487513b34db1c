"""Grapheme-to-phoneme (G2P) for TTS text frontends.

Reference parity: `nemo.collections.tts.g2p` (ARPABET/IPA dictionary G2P
with heteronym handling and grapheme fallback). Dictionary-driven: loads a
CMUdict-format lexicon when provided; ships a small builtin seed lexicon;
unknown words fall back to graphemes (the reference's behavior with
`phoneme_probability<1` / OOV handling).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence

# Small builtin seed lexicon (ARPABET) so G2P works out of the box.
_BUILTIN = {
    "a": "AH0", "the": "DH AH0", "hello": "HH AH0 L OW1",
    "world": "W ER1 L D", "test": "T EH1 S T", "speech": "S P IY1 CH",
    "to": "T UW1", "text": "T EH1 K S T", "is": "IH1 Z", "this": "DH IH1 S",
}

ARPABET_PHONEMES = [
    "AA", "AE", "AH", "AO", "AW", "AY", "B", "CH", "D", "DH", "EH", "ER",
    "EY", "F", "G", "HH", "IH", "IY", "JH", "K", "L", "M", "N", "NG", "OW",
    "OY", "P", "R", "S", "SH", "T", "TH", "UH", "UW", "V", "W", "Y", "Z", "ZH",
]


class EnglishG2p:
    def __init__(self, phoneme_dict: Optional[str] = None,
                 grapheme_fallback: bool = True):
        self.lexicon: Dict[str, List[str]] = {
            w: p.split() for w, p in _BUILTIN.items()
        }
        self.grapheme_fallback = grapheme_fallback
        if phoneme_dict:
            self._load_cmudict(phoneme_dict)

    def _load_cmudict(self, path: str) -> None:
        with open(path, encoding="latin-1") as f:
            for line in f:
                if line.startswith(";;;") or not line.strip():
                    continue
                parts = line.strip().split()
                word = parts[0].lower()
                word = re.sub(r"\(\d+\)$", "", word)  # keep first variant
                if word not in self.lexicon:
                    self.lexicon[word] = parts[1:]

    def __call__(self, text: str) -> List[str]:
        """Text → phoneme (or fallback grapheme) token list; punctuation kept."""
        out: List[str] = []
        for token in re.findall(r"[a-zA-Z']+|[^a-zA-Z\s]", text.lower()):
            if token in self.lexicon:
                out.extend(self.lexicon[token])
            elif token.isalpha() and self.grapheme_fallback:
                out.extend(list(token))
            else:
                out.append(token)
            out.append(" ")
        return out[:-1] if out else out


class PhonemeTokenizer:
    """Phoneme vocabulary tokenizer for FastPitch-style models
    (reference tts_tokenizers.py EnglishPhonemesTokenizer)."""

    def __init__(self, g2p: Optional[EnglishG2p] = None):
        self.g2p = g2p or EnglishG2p()
        stressed = [p + s for p in ARPABET_PHONEMES for s in ("", "0", "1", "2")]
        chars = [chr(ord("a") + i) for i in range(26)]
        punct = list("!'\"(),.:;?- ")
        self.vocab = ["<pad>"] + sorted(set(stressed)) + chars + punct + ["<blank>"]
        self._stoi = {t: i for i, t in enumerate(self.vocab)}
        self.pad_id = 0

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def text_to_ids(self, text: str) -> List[int]:
        return [self._stoi[t] for t in self.g2p(text) if t in self._stoi]

    def ids_to_text(self, ids: Sequence[int]) -> str:
        return " ".join(self.vocab[i] for i in ids)


# ---------------------------------------------------------------------------
# Heteronym classification (reference:
# nemo/collections/tts/g2p/models/heteronym_classification.py — a token
# classifier picks the pronunciation of context-dependent words like
# "read"/"live"/"bass" before dictionary lookup)
# ---------------------------------------------------------------------------

# seed heteronym inventory: word → list of ARPABET pronunciations
HETERONYMS: Dict[str, List[str]] = {
    "read": ["R IY1 D", "R EH1 D"],        # present / past
    "live": ["L IH1 V", "L AY1 V"],        # verb / adjective
    "bass": ["B AE1 S", "B EY1 S"],        # fish / music
    "lead": ["L IY1 D", "L EH1 D"],        # verb / metal
    "wind": ["W IH1 N D", "W AY1 N D"],    # air / to turn
}


class HeteronymClassifier:
    """Char-context classifier over the joint (word, pronunciation) label
    space: a window of characters around the heteronym runs through a
    small conv encoder; logits are masked to the word's own pronunciation
    options. Pure flax; trains from (sentence, word, label) triples."""

    def __init__(self, heteronyms: Optional[Dict[str, List[str]]] = None,
                 window: int = 32, seed: int = 0):
        import flax.linen as nn
        import jax
        import jax.numpy as jnp

        self.het = dict(heteronyms or HETERONYMS)
        self.window = window
        self.labels = [(w, i) for w in sorted(self.het)
                       for i in range(len(self.het[w]))]
        self._lab2id = {wl: i for i, wl in enumerate(self.labels)}
        self.n_labels = len(self.labels)
        n_labels = self.n_labels

        class _Net(nn.Module):
            @nn.compact
            def __call__(self, chars):  # [B, W] int32 (char codes mod 128)
                x = nn.Embed(128, 48, name="emb")(chars)
                for i, d in enumerate((1, 2, 4)):
                    h = nn.Conv(64, (5,), kernel_dilation=(d,),
                                padding="SAME", name=f"c{i}")(x if i else x)
                    x = nn.silu(nn.LayerNorm(name=f"ln{i}")(h)) + (
                        x if x.shape[-1] == 64 else 0.0)
                pooled = jnp.max(x, axis=1)
                return nn.Dense(n_labels, name="out")(pooled)

        self.net = _Net()
        self._jax = (jax, jnp)
        chars = jnp.zeros((1, window), jnp.int32)
        self.variables = self.net.init(jax.random.PRNGKey(seed), chars)
        self._jit_logits = jax.jit(self.net.apply)

    # -- data --------------------------------------------------------------
    def _window(self, sentence: str, word: str) -> "np.ndarray":
        import numpy as np

        s = sentence.lower()
        i = s.find(word)
        half = self.window // 2
        lo = max(0, i + len(word) // 2 - half)
        chunk = s[lo: lo + self.window].ljust(self.window)
        return np.asarray([ord(c) % 128 for c in chunk], np.int32)

    def _mask(self, word: str):
        import numpy as np

        m = np.full(self.n_labels, -1e30, np.float32)
        for i in range(len(self.het[word])):
            m[self._lab2id[(word, i)]] = 0.0
        return m

    # -- train / predict ----------------------------------------------------
    def make_train_step(self, lr: float = 2e-3):
        import jax
        import jax.numpy as jnp
        import optax

        tx = optax.adamw(lr)
        net = self.net

        @jax.jit
        def step(v, opt, chars, mask, label):
            def f(v):
                logits = net.apply(v, chars) + mask
                return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                    logits, label))

            loss, g = jax.value_and_grad(f)(v)
            up, opt = tx.update(g, opt, v)
            return optax.apply_updates(v, up), opt, loss

        return tx, step

    def encode_batch(self, examples):
        """[(sentence, word, pron_index)] → (chars, mask, label) arrays."""
        import numpy as np

        chars = np.stack([self._window(s, w) for s, w, _ in examples])
        mask = np.stack([self._mask(w) for _, w, _ in examples])
        label = np.asarray([self._lab2id[(w, i)] for _, w, i in examples],
                           np.int32)
        return chars, mask, label

    def predict(self, sentence: str, word: str) -> str:
        """→ the chosen ARPABET pronunciation for `word` in `sentence`."""
        import numpy as np

        chars = self._window(sentence, word)[None]
        logits = np.asarray(self._jit_logits(self.variables, chars))[0]
        logits = logits + self._mask(word)
        w, i = self.labels[int(np.argmax(logits))]
        return self.het[w][i]


# ---------------------------------------------------------------------------
# IPA G2P (reference: nemo/collections/tts/g2p/models/i18n_ipa.py IpaG2p +
# scripts/tts_dataset_files/ipa_cmudict — IPA phoneme pipeline with
# stochastic grapheme mixing for robustness)
# ---------------------------------------------------------------------------

# standard ARPABET→IPA table (vowels carry stress via ˈ/ˌ prefixes)
ARPABET_TO_IPA: Dict[str, str] = {
    "AA": "ɑ", "AE": "æ", "AH": "ʌ", "AO": "ɔ", "AW": "aʊ", "AY": "aɪ",
    "B": "b", "CH": "tʃ", "D": "d", "DH": "ð", "EH": "ɛ", "ER": "ɝ",
    "EY": "eɪ", "F": "f", "G": "ɡ", "HH": "h", "IH": "ɪ", "IY": "i",
    "JH": "dʒ", "K": "k", "L": "l", "M": "m", "N": "n", "NG": "ŋ",
    "OW": "oʊ", "OY": "ɔɪ", "P": "p", "R": "ɹ", "S": "s", "SH": "ʃ",
    "T": "t", "TH": "θ", "UH": "ʊ", "UW": "u", "V": "v", "W": "w",
    "Y": "j", "Z": "z", "ZH": "ʒ",
}
_STRESS_IPA = {"1": "ˈ", "2": "ˌ", "0": ""}


def arpabet_to_ipa(phones: Sequence[str]) -> List[str]:
    """['HH', 'AH0', 'L', 'OW1'] → ['h', 'ʌ', 'l', 'ˈoʊ'] (stress digit on
    a vowel becomes the IPA stress mark prefixed to that vowel)."""
    out = []
    for p in phones:
        stress = ""
        base = p
        if p and p[-1] in "012":
            stress = _STRESS_IPA[p[-1]]
            base = p[:-1]
        out.append(stress + ARPABET_TO_IPA.get(base, base))
    return out


class IpaG2p:
    """IPA-emitting G2P (reference IpaG2p): dictionary lookup → IPA symbol
    sequence, with `phoneme_probability` stochastically keeping whole words
    as graphemes (the reference's training-robustness trick — models see
    both representations; set 1.0 for deterministic inference)."""

    def __init__(self, phoneme_dict: Optional[str] = None,
                 ipa_dict: Optional[str] = None,
                 phoneme_probability: float = 1.0, seed: int = 0):
        import numpy as np

        base = EnglishG2p(phoneme_dict=phoneme_dict)
        self.lexicon: Dict[str, List[str]] = {
            w: arpabet_to_ipa(p) for w, p in base.lexicon.items()
        }
        if ipa_dict:
            self._load_ipa_dict(ipa_dict)
        self.phoneme_probability = float(phoneme_probability)
        self._rng = np.random.RandomState(seed)

    def _load_ipa_dict(self, path: str) -> None:
        """Lines: `WORD  ipastring` (reference ipa dict format; multiple
        entries keep the first)."""
        with open(path, encoding="utf-8") as f:
            for line in f:
                if not line.strip() or line.startswith(";;;"):
                    continue
                word, _, pron = line.strip().partition(" ")
                word = re.sub(r"\(\d+\)$", "", word.lower())
                pron = pron.strip()
                if word and pron and word not in self.lexicon:
                    self.lexicon[word] = self._split_ipa(pron)

    @staticmethod
    def _split_ipa(s: str) -> List[str]:
        """IPA string → symbols, keeping stress marks and affricates/
        diphthongs (2-char sequences from the table) attached."""
        two = {v for v in ARPABET_TO_IPA.values() if len(v) == 2}
        out: List[str] = []
        i = 0
        while i < len(s):
            stress = ""
            if s[i] in "ˈˌ":
                stress, i = s[i], i + 1
                if i >= len(s):
                    break
            if s[i : i + 2] in two:
                out.append(stress + s[i : i + 2])
                i += 2
            else:
                out.append(stress + s[i])
                i += 1
        return out

    def set_phoneme_probability(self, p: float) -> None:
        self.phoneme_probability = float(p)

    def __call__(self, text: str) -> List[str]:
        out: List[str] = []
        for token in re.findall(r"[a-zA-Z']+|[^a-zA-Z\s]", text.lower()):
            use_phonemes = (token in self.lexicon
                            and self._rng.rand() < self.phoneme_probability)
            if use_phonemes:
                out.extend(self.lexicon[token])
            elif token.isalpha():
                out.extend(list(token))
            else:
                out.append(token)
            out.append(" ")
        return out[:-1] if out else out


class IpaTokenizer:
    """IPA phoneme vocabulary tokenizer (reference tts_tokenizers.py
    IPATokenizer): IPA symbols (stressed + unstressed) + graphemes +
    punctuation."""

    def __init__(self, g2p: Optional[IpaG2p] = None):
        self.g2p = g2p or IpaG2p()
        symbols = set()
        for ipa in ARPABET_TO_IPA.values():
            for stress in ("", "ˈ", "ˌ"):
                symbols.add(stress + ipa)
        chars = [chr(ord("a") + i) for i in range(26)]
        punct = list("!'\"(),.:;?- ")
        self.vocab = ["<pad>"] + sorted(symbols) + chars + punct + ["<blank>"]
        self._stoi = {t: i for i, t in enumerate(self.vocab)}
        self.pad_id = 0

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def text_to_ids(self, text: str) -> List[int]:
        return [self._stoi[t] for t in self.g2p(text) if t in self._stoi]

    def ids_to_text(self, ids: Sequence[int]) -> str:
        return " ".join(self.vocab[i] for i in ids)
