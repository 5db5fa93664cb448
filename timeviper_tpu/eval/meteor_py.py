"""Pure-Python METEOR — replaces the reference's meteor-1.5.jar subprocess.

The reference scores YouCook2 SODA caption similarity with the METEOR 1.5
Java jar (`/root/reference/eval/metrics/meteor.py:21-35`, flags
``-l en -norm``). No JRE ships in this image, so this module implements the
METEOR algorithm itself (Denkowski & Lavie 2014, "Meteor Universal"):

* one-to-one word alignment over matcher stages — **exact** (weight 1.0)
  and **stem** (weight 0.6, Snowball English via nltk's pure-Python
  implementation). The jar's synonym/paraphrase stages need WordNet and a
  paraphrase corpus that aren't in the image; their absence lowers recall
  of near-miss matches slightly and is documented here rather than silently
  substituted (the pre-round-4 fallback scored SODA with token-F1 instead).
* alignment chosen by beam search maximizing matched words, then fewest
  chunks, then smallest total |i-j| distance — the jar's resolution order.
* scoring with the English defaults: alpha=0.85, beta=0.2, gamma=0.6,
  delta=0.75; content words weighted delta, function words 1-delta.

      P      = sum(w_mod * w_word) over hyp-side matches / sum w_word(hyp)
      R      = same over the reference side
      Fmean  = P*R / (alpha*P + (1-alpha)*R)
      frag   = chunks / matches
      score  = (1 - gamma * frag**beta) * Fmean

Note METEOR deliberately does not score identical sentences 1.0: a single
chunk still carries the fragmentation penalty gamma*(1/m)**beta.

API mirrors eval/meteor.py's jar wrapper: ``compute_score(res, gts)`` with
``{id: [hypothesis]}`` / ``{id: [ref, ...]}`` returning ``(mean, scores)``;
multi-reference items take the best-scoring reference, as the jar does.
"""

from __future__ import annotations

import functools
import re
from typing import Dict, List, Sequence, Tuple

ALPHA, BETA, GAMMA, DELTA = 0.85, 0.2, 0.6, 0.75
W_EXACT, W_STEM = 1.0, 0.6
BEAM = 64

# English function words (METEOR 1.5 ships data/function/en.words, built
# from corpus frequency; this embedded list covers the closed-class core —
# determiners, pronouns, prepositions, conjunctions, auxiliaries,
# punctuation). Content/function only reweights by delta, so residual list
# differences perturb scores far less than the matcher stages do.
_FUNCTION_WORDS = frozenset("""
a an the this that these those some any each every no neither either
i you he she it we they me him her us them my your his its our their
mine yours hers ours theirs myself yourself himself herself itself
ourselves yourselves themselves who whom whose which what
and or but nor so yet for if while although though because since unless
until when whenever where wherever whether as than
in on at by with from to of about against between into through during
before after above below up down out off over under again further then
once here there all both few more most other such only own same too very
just also not
am is are was were be been being have has had having do does did doing
will would shall should may might must can could
's 't 'll 've 're 'd 'm n't
. , ; : ! ? ' " ` ( ) [ ] { } - -- ...
""".split())

_PUNCT_RE = re.compile(r"([\.,;:!\?\"\(\)\[\]\{\}])")


def normalize(text: str) -> List[str]:
    """METEOR ``-norm``: lowercase, split off punctuation, whitespace-split."""
    text = text.replace("<", " ").replace(">", " ")
    text = _PUNCT_RE.sub(r" \1 ", text)
    return text.lower().split()


@functools.lru_cache(maxsize=65536)
def _stem(tok: str) -> str:
    return _stemmer()(tok)


@functools.lru_cache(maxsize=1)
def _stemmer():
    try:
        from nltk.stem.snowball import SnowballStemmer

        return SnowballStemmer("english").stem
    except Exception:  # pragma: no cover - nltk is baked into the image
        return lambda t: t


def _align(hyp: List[str], ref: List[str]):
    """One-to-one alignment; returns (matches, chunks) where matches is a
    list of (hyp_idx, ref_idx, module_weight)."""
    n, m = len(hyp), len(ref)
    # candidate ref positions per hyp word, each with its best module
    cand: List[List[Tuple[int, float]]] = []
    hyp_stems = [_stem(t) for t in hyp]
    ref_stems = [_stem(t) for t in ref]
    for i in range(n):
        row = []
        for j in range(m):
            if hyp[i] == ref[j]:
                row.append((j, W_EXACT))
            elif hyp_stems[i] == ref_stems[j]:
                row.append((j, W_STEM))
        cand.append(row)

    # beam over hyp positions: state = (used ref bitmask, last matched
    # (hi, rj) for chunk continuation, matches list, chunks, total dist)
    # ranked by (-#matches, chunks, dist) — METEOR's resolution order.
    Start = (0, None, (), 0, 0.0)
    beam = [Start]
    for i in range(n):
        nxt = []
        for used, last, ms, ch, dist in beam:
            nxt.append((used, last, ms, ch, dist))  # leave hyp[i] unmatched
            for j, w in cand[i]:
                if used >> j & 1:
                    continue
                contiguous = last is not None and last == (i - 1, j - 1)
                nxt.append((used | (1 << j), (i, j), ms + ((i, j, w),),
                            ch + (0 if contiguous else 1),
                            dist + abs(i - j)))
        nxt.sort(key=lambda s: (-len(s[2]), s[3], s[4]))
        # dedupe identical (used, last) keeping the best-ranked
        seen, beam = set(), []
        for s in nxt:
            k = (s[0], s[1])
            if k in seen:
                continue
            seen.add(k)
            beam.append(s)
            if len(beam) >= BEAM:
                break
    _, _, ms, ch, _ = beam[0]
    return list(ms), ch


def _word_weight(tok: str) -> float:
    return 1.0 - DELTA if tok in _FUNCTION_WORDS else DELTA


def sentence_score(hypothesis: str, references: Sequence[str]) -> float:
    hyp = normalize(hypothesis)
    best = 0.0
    for reference in references:
        ref = normalize(reference)
        if not hyp or not ref:
            continue
        matches, chunks = _align(hyp, ref)
        if not matches:
            continue
        hyp_total = sum(_word_weight(t) for t in hyp)
        ref_total = sum(_word_weight(t) for t in ref)
        p_num = sum(w * _word_weight(hyp[i]) for i, _, w in matches)
        r_num = sum(w * _word_weight(ref[j]) for _, j, w in matches)
        p = p_num / hyp_total if hyp_total else 0.0
        r = r_num / ref_total if ref_total else 0.0
        if p + r == 0:
            continue
        fmean = p * r / (ALPHA * p + (1.0 - ALPHA) * r)
        frag = chunks / len(matches)
        score = (1.0 - GAMMA * frag ** BETA) * fmean
        best = max(best, score)
    return best


class MeteorPyScorer:
    """Drop-in for eval/meteor.py's jar wrapper (same compute_score API)."""

    def compute_score(self, res: Dict, gts: Dict) -> Tuple[float, list]:
        ids = list(res.keys())
        scores = [sentence_score(res[i][0], gts[i]) for i in ids]
        mean = sum(scores) / len(scores) if scores else 0.0
        return mean, scores
