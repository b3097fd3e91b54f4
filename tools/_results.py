"""Shared parsing of the recipes' persisted RESULT lines.

run.sh stage 7 writes ``${obdir}/RESULT.${pair}`` with the reference-shaped
one-line summary (reference: egs/vcc20/vae1/test.sh:16-24); these helpers
turn them into dicts for the round-5 cross-run summaries.
"""

import re
from pathlib import Path

_NUM = r"([-0-9.]+|n/a)"
_PAT = re.compile(
    rf"RESULT (\S+)\s+MCD: {_NUM}\s+CER: {_NUM}\s+WER: {_NUM}"
    rf"\s+PLDA: {_NUM}\s+COSSIM: {_NUM}")


def parse_result_file(path):
    """-> dict(pair, MCD, CER, WER, PLDA, COSSIM) or None."""
    m = _PAT.search(Path(path).read_text())
    if not m:
        return None
    pair, *vals = m.groups()
    keys = ("MCD", "CER", "WER", "PLDA", "COSSIM")
    return {"pair": pair, **{k: (None if v == "n/a" else float(v))
                             for k, v in zip(keys, vals)}}


def spearman(xs, ys):
    """Spearman rank correlation (average ranks for ties)."""
    import numpy as np

    def ranks(v):
        v = np.asarray(v, float)
        order = np.argsort(v)
        r = np.empty(len(v))
        i = 0
        while i < len(v):
            j = i
            while j + 1 < len(v) and v[order[j + 1]] == v[order[i]]:
                j += 1
            r[order[i:j + 1]] = (i + j) / 2.0
            i = j + 1
        return r

    rx, ry = ranks(xs), ranks(ys)
    rx -= rx.mean(); ry -= ry.mean()
    denom = float(np.sqrt((rx ** 2).sum() * (ry ** 2).sum()))
    return float((rx * ry).sum() / denom) if denom else float("nan")
