"""Rot guards for the perf/ops tooling under tools/.

Round 4 found tools/perf_sweep.py's GroupNorm ablation patches silently
broken by an nn/blocks signature change from round 3 — these smokes keep
every measurement harness importable and runnable at toy scale on CPU so
an on-chip session never discovers bit-rot with chip time.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_perf_decompose_tiny_variants(capsys):
    # ALL variants, including the hand-rolled grads_only path (the one most
    # coupled to Trainer internals — exactly what this rot guard is for)
    from tools import perf_decompose

    perf_decompose.main(["--tiny", "--steps", "1",
                         "--variants", ",".join(perf_decompose.VARIANTS)])
    out = [json.loads(l) for l in
           capsys.readouterr().out.strip().splitlines()]
    names = {r.get("variant") for r in out if "variant" in r}
    assert names == set(perf_decompose.VARIANTS)
    assert all(r["ms_per_step"] > 0 for r in out if "variant" in r)


def test_attn_micro_interpret(capsys):
    from tools import attn_micro

    attn_micro.main(["--repeats", "1", "--shape", "2,2,64,32",
                     "--interpret"])
    rows = [json.loads(l) for l in
            capsys.readouterr().out.strip().splitlines()]
    assert {r["operands"] for r in rows} == {"bf16", "fp32"}
    for r in rows:
        for k in ("fused_fwd_ms", "fused_grad_ms", "stock_fwd_ms",
                  "stock_grad_ms"):
            assert r[k] > 0


def test_int8_probe_throughput_only(capsys):
    from tools import int8_probe

    rows = int8_probe.throughput_rows(repeats=1)
    assert len(rows) == 3
    assert all(r["bf16_tflops"] > 0 for r in rows)


def test_rtf_gl_row():
    from tools import rtf_families

    row = rtf_families._gl_row(B=1, T=32, steps=1, n_iter=2)
    assert row["rtf_amortized"] > 0 and row["rtf_single"] > 0
