"""Text frontend: grapheme→phoneme tokenization with a g2p_en-compatible vocabulary.

The reference builds its vocab from ``g2p_en.G2p().phonemes`` plus space/comma/period
(``/root/reference/valle/data.py:18-25``).  That inventory is the public CMUdict
ARPAbet set (stressed vowels + consonants) with 4 special tokens — reproduced here as a
constant so token IDs are stable whether or not ``g2p_en`` is installed.

When ``g2p_en`` is importable we use it (exact reference behaviour).  Otherwise a
deterministic rule-based letter-to-phoneme fallback keeps the pipeline runnable
(synthetic data, tests, zero-egress environments); it is NOT linguistically accurate
and is clearly flagged.
"""

from __future__ import annotations

import re
from functools import lru_cache

import numpy as np

# g2p_en's specials + CMUdict ARPAbet phoneme inventory (stress-marked vowels).
_SPECIALS = ['<pad>', '<unk>', '<s>', '</s>']
_VOWELS = ['AA', 'AE', 'AH', 'AO', 'AW', 'AY', 'EH', 'ER', 'EY', 'IH', 'IY', 'OW',
           'OY', 'UH', 'UW']
_CONSONANTS = ['B', 'CH', 'D', 'DH', 'F', 'G', 'HH', 'JH', 'K', 'L', 'M', 'N', 'NG',
               'P', 'R', 'S', 'SH', 'T', 'TH', 'V', 'W', 'Y', 'Z', 'ZH']
PHONEMES = (_SPECIALS
            + sorted([f'{v}{s}' for v in _VOWELS for s in (0, 1, 2)])
            + sorted(_CONSONANTS))
# The reference appends ' ', ',', '.' after the phoneme list (data.py:20-22).
PUNCTUATION = [' ', ',', '.']

# Crude letter→ARPAbet rules for the no-g2p_en fallback.
_LETTER_RULES: dict[str, list[str]] = {
    'a': ['AE1'], 'b': ['B'], 'c': ['K'], 'd': ['D'], 'e': ['EH1'], 'f': ['F'],
    'g': ['G'], 'h': ['HH'], 'i': ['IH1'], 'j': ['JH'], 'k': ['K'], 'l': ['L'],
    'm': ['M'], 'n': ['N'], 'o': ['AA1'], 'p': ['P'], 'q': ['K', 'W'], 'r': ['R'],
    's': ['S'], 't': ['T'], 'u': ['AH1'], 'v': ['V'], 'w': ['W'], 'x': ['K', 'S'],
    'y': ['Y'], 'z': ['Z'],
}
_DIGRAPHS = {'ch': ['CH'], 'sh': ['SH'], 'th': ['TH'], 'ph': ['F'], 'ng': ['NG'],
             'ee': ['IY1'], 'oo': ['UW1'], 'ay': ['EY1'], 'qu': ['K', 'W']}


class PhonemeTokenizer:
    """symbol↔id mapping identical to the reference's ``sym2idx`` construction."""

    def __init__(self, use_g2p: bool | None = None):
        self.sym2idx: dict[str, int] = {}
        self._g2p = None
        if use_g2p is not False:
            try:
                from g2p_en import G2p  # optional; not in this image
                self._g2p = G2p()
            except Exception:
                if use_g2p is True:
                    raise
        phonemes = list(self._g2p.phonemes) if self._g2p is not None else PHONEMES
        for sym in phonemes:
            self.sym2idx[sym] = len(self.sym2idx)
        for sym in PUNCTUATION:
            self.sym2idx[sym] = len(self.sym2idx)
        self.idx2sym = {v: k for k, v in self.sym2idx.items()}

    @property
    def vocab_size(self) -> int:
        return len(self.sym2idx)

    def phonemize(self, text: str) -> list[str]:
        if self._g2p is not None:
            return list(self._g2p(text))
        return _fallback_phonemize(text)

    def __call__(self, text: str) -> np.ndarray:
        """Text → int32 phoneme ids (reference ValleDataset._tokenize, data.py:24-25).
        Unknown symbols map to <unk> (the reference would KeyError)."""
        unk = self.sym2idx.get('<unk>', 1)
        return np.asarray([self.sym2idx.get(p, unk) for p in self.phonemize(text)],
                          dtype=np.int32)

    def decode(self, ids) -> list[str]:
        return [self.idx2sym.get(int(i), '<unk>') for i in ids]


@lru_cache(maxsize=4096)
def _word_to_phonemes(word: str) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(word):
        pair = word[i:i + 2]
        if pair in _DIGRAPHS:
            out.extend(_DIGRAPHS[pair])
            i += 2
            continue
        ch = word[i]
        out.extend(_LETTER_RULES.get(ch, []))
        i += 1
    return tuple(out)


def _fallback_phonemize(text: str) -> list[str]:
    """Deterministic rule-based G2P substitute (NOT linguistically accurate)."""
    tokens: list[str] = []
    for piece in re.findall(r"[a-zA-Z']+|[,.]|\s+", text):
        if piece.isspace():
            tokens.append(' ')
        elif piece in (',', '.'):
            tokens.append(piece)
        else:
            tokens.extend(_word_to_phonemes(piece.lower().replace("'", '')))
    return tokens
