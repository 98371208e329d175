"""Regenerate (or check) every benchmark-derived number in the docs.

VERDICT r4 item 4: doc tables drifted from the committed benchmark JSONs
in two consecutive rounds (b64 quoted at 6.9 ms/80% MFU vs the JSON's
7.291/76.2%; BASELINE.md carried a 3.05x preprocess row after the JSON
said 19.35x). The structural fix: the docs contain GEN-marked regions

    <!-- GEN:name -->...<!-- /GEN:name -->

whose contents are OWNED by this script — each region is regenerated
verbatim from the committed benchmarks/*.json, never hand-edited. A
fast test (tests/test_doc_tables.py) runs ``--check`` so CI fails the
moment a doc number diverges from its JSON.

Run:  python tools/update_doc_tables.py            # rewrite in place
      python tools/update_doc_tables.py --check    # exit 1 on drift
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DOC_FILES = [
    "README.md",
    "BASELINE.md",
    "PARITY.md",
    os.path.join("docs", "SCALING.md"),
    os.path.join("docs", "DEPLOY.md"),
    os.path.join("docs", "MIGRATION.md"),
]


def _load(name: str) -> dict:
    with open(os.path.join(REPO, "benchmarks", name)) as f:
        return json.load(f)


# ---------------------------------------------------------------- generators

def gen_bf16_step_table() -> str:
    """SCALING.md: the bf16+fold engine-step table, one row per batch."""
    res = _load("inference_step.json")["results"]
    rows = ["  | Engine step (1024², bf16+fold default) | ms/img | TF/s "
            "| MFU |",
            "  |---|---|---|---|"]
    keys = sorted((k for k in res if k.startswith("bf16_fold_b")),
                  key=lambda k: int(k.rsplit("b", 1)[1]))
    best = min(res[k]["ms_per_img"] for k in keys)
    for k in keys:
        r = res[k]
        b = int(k.rsplit("b", 1)[1])
        ms = (f"**{r['ms_per_img']:.2f}**"
              if r["ms_per_img"] == best else f"{r['ms_per_img']:.2f}")
        rows.append(f"  | batch {b} | {ms} | {r['tflops_per_s']:.1f} | "
                    f"{r['mfu_pct']:.1f}% |")
    return "\n".join(rows)


def gen_int8_step_table() -> str:
    """SCALING.md: bf16 vs int8 engine step + speedup, per batch."""
    res = _load("inference_step.json")["results"]
    rows = ["  | Engine step (1024², trained bench model) | ms/img "
            "bf16+fold | ms/img int8 | speedup |",
            "  |---|---|---|---|"]
    batches = sorted(int(k.rsplit("b", 1)[1]) for k in res
                     if k.startswith("int8_b"))
    best = min(res[f"int8_b{b}"]["ms_per_img"] for b in batches)
    for b in batches:
        bf, q = res[f"bf16_fold_b{b}"], res[f"int8_b{b}"]
        ms = (f"**{q['ms_per_img']:.2f}**"
              if q["ms_per_img"] == best else f"{q['ms_per_img']:.2f}")
        rows.append(f"  | batch {b} | {bf['ms_per_img']:.2f} | {ms} | "
                    f"{bf['ms_per_img'] / q['ms_per_img']:.2f}× |")
    return "\n".join(rows)


def _int8_speedups() -> list[float]:
    res = _load("inference_step.json")["results"]
    return [res[f"bf16_fold_b{b}"]["ms_per_img"]
            / res[f"int8_b{b}"]["ms_per_img"]
            for b in sorted(int(k.rsplit("b", 1)[1]) for k in res
                            if k.startswith("int8_b"))]


def gen_int8_speedup_range() -> str:
    sp = _int8_speedups()
    return f"{min(sp):.2f}–{max(sp):.2f}×"


def gen_bf16_mfu_range() -> str:
    res = _load("inference_step.json")["results"]
    mfus = [res[k]["mfu_pct"] for k in res if k.startswith("bf16_fold_b")]
    return f"{min(mfus):.0f}–{max(mfus):.0f}%"


def gen_int8_best() -> str:
    res = _load("inference_step.json")["results"]
    items = [(res[k]["ms_per_img"], int(k.rsplit("b", 1)[1]))
             for k in res if k.startswith("int8_b")]
    ms, b = min(items)
    return f"{ms:.2f} ms/img int8 at batch {b}"


def gen_bf16_b16_b32() -> str:
    res = _load("inference_step.json")["results"]
    b16, b32 = res["bf16_fold_b16"], res["bf16_fold_b32"]
    return (f"{b16['ms_per_img']:.2f} ms/img @ b16 "
            f"({b16['mfu_pct']:.0f}% MFU); {b32['ms_per_img']:.2f} @ b32 "
            f"({b32['mfu_pct']:.0f}%)")


def gen_int8_agreement() -> str:
    return f"{_load('int8_agreement.json')['pixel_agreement_pct']:.2f}%"


def gen_int8_miou_anchor() -> str:
    m = _load("int8_agreement.json")["miou_vs_generated_duals"]
    return (f"mIoU vs the generated duals: bf16 {m['bf16_fold']:.1f}, "
            f"int8 {m['int8']:.1f}")


def gen_preprocess_row() -> str:
    """BASELINE.md measured-results table: the preprocess row."""
    p = _load("preprocess.json")
    return (
        "| Preprocess (4096² BMP → decode → cubic resize → trim → PNG), "
        "full loop incl. PNG encode | "
        f"{p['reference_cpu_sec_per_image']:.2f} s/image (PIL + scipy "
        "spline, 1 thread — the exact reference path; the round-3 "
        "protocol quoted 4.29 s using a smaller-folder best-pass clock, "
        "re-measured under the committed tool's full-folder protocol) | "
        f"**{p['backend_host_sec_per_image']:.2f} s/image** native "
        "threaded host backend (auto-picked; device backend "
        f"{p['backend_device_sec_per_image']:.2f} s on this tunnel-fed "
        "host) — `benchmarks/preprocess.json` | "
        f"**{p['speedup_vs_reference']:.1f}×** |")


def gen_e2e_row() -> str:
    """BASELINE.md measured-results table: the 4096² BMP→CSV e2e row."""
    e = _load("e2e_pipeline.json")
    pre_ref = _load("preprocess.json")["reference_cpu_sec_per_image"]
    pred_ref = _load("reference_baseline.json")["sec_per_image"]
    # 'auto' always runs the streaming plan (bounded memory; measured
    # within run noise of sequential on a 1-core host — cli/predict.py)
    auto = e["streaming_img_per_sec"]
    return (
        "| Full pipeline, 4096² BMP → preprocess → predict → CSV "
        "(everything, one command) | measured reference path: preprocess "
        f"{pre_ref:.2f} s/img + predict {pred_ref:.2f} s/img, both "
        "sequential | "
        f"**{auto:.2f} images/s** on the 1-core bench host "
        f"(streaming plan, the default; {e['sequential_img_per_sec']:.2f}"
        f" sequential vs {e['streaming_img_per_sec']:.2f} streaming, "
        f"median of {len(e['passes_sequential_s'])} interleaved passes "
        "— `benchmarks/e2e_pipeline.json`) | "
        f"**{auto * (pre_ref + pred_ref):.0f}×** |")


def gen_serving_soak() -> str:
    """DEPLOY.md: the committed serving-soak summary line."""
    s = _load("serving_soak.json")
    lat = s["latency_ms"]
    pr = s.get("platform_retention", {})
    if pr.get("clean_platform"):
        rss = s["rss_mb"]
        rss_part = (f"RSS flat {rss['first_third_mean']:.0f} → "
                    f"{rss['last_third_mean']:.0f} MB (clean PJRT, raw "
                    f"invariant)")
    else:
        res = s["rss_resid_mb"]
        rss_part = (f"upload-independent RSS flat "
                    f"{res['first_third_mean']:.0f} → "
                    f"{res['last_third_mean']:.0f} MB (raw RSS tracks "
                    f"the dev tunnel's {pr.get('fitted_mb_per_mb', 0):.2f}"
                    f" MB/MB transfer retention — see the RSS-attribution"
                    f" bullet below)")
    return (f"{s['seconds'] / 60.0:.0f}-minute soak, {s['clients']} "
            f"concurrent clients, {s['served']} requests served "
            f"({s['errors']} errors): {s['throughput_rps']:.1f} req/s "
            f"sustained, p50/p95/p99 {lat['p50'] / 1e3:.2f}/"
            f"{lat['p95'] / 1e3:.2f}/{lat['p99'] / 1e3:.2f} s, "
            f"{rss_part}, mean batch {s['mean_batch']:.1f}")


GENERATORS = {
    "bf16_step_table": gen_bf16_step_table,
    "int8_step_table": gen_int8_step_table,
    "int8_speedup_range": gen_int8_speedup_range,
    "bf16_mfu_range": gen_bf16_mfu_range,
    "int8_best": gen_int8_best,
    "bf16_b16_b32": gen_bf16_b16_b32,
    "int8_agreement": gen_int8_agreement,
    "int8_miou_anchor": gen_int8_miou_anchor,
    "preprocess_row": gen_preprocess_row,
    "e2e_row": gen_e2e_row,
    "serving_soak": gen_serving_soak,
}

_MARK = re.compile(r"<!-- GEN:([a-z0-9_]+) -->(.*?)<!-- /GEN:\1 -->",
                   re.DOTALL)


def process(check: bool) -> int:
    drift = 0
    seen: set[str] = set()
    for rel in DOC_FILES:
        path = os.path.join(REPO, rel)
        with open(path) as f:
            text = f.read()

        def sub(m: re.Match) -> str:
            name = m.group(1)
            if name not in GENERATORS:
                raise SystemExit(f"{rel}: unknown GEN block '{name}'")
            seen.add(name)
            gen = GENERATORS[name]()
            # multi-line blocks keep surrounding newlines inside markers
            if "\n" in m.group(2):
                gen = "\n" + gen + "\n"
            return f"<!-- GEN:{name} -->{gen}<!-- /GEN:{name} -->"

        new = _MARK.sub(sub, text)
        if new != text:
            drift += 1
            if check:
                for old_m, new_m in zip(_MARK.finditer(text),
                                        _MARK.finditer(new)):
                    if old_m.group(0) != new_m.group(0):
                        print(f"DRIFT {rel} block "
                              f"'{old_m.group(1)}':\n  doc: "
                              f"{old_m.group(2).strip()[:120]}\n  json: "
                              f"{new_m.group(2).strip()[:120]}")
            else:
                with open(path, "w") as f:
                    f.write(new)
                print(f"updated {rel}")
    unused = set(GENERATORS) - seen
    if unused:
        print(f"note: generators never referenced by any doc: "
              f"{sorted(unused)}", file=sys.stderr)
    return drift


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--check", action="store_true",
                    help="exit 1 if any doc block differs from its JSON")
    args = ap.parse_args()
    drift = process(args.check)
    if args.check and drift:
        print(f"{drift} doc file(s) out of date — run "
              "python tools/update_doc_tables.py", file=sys.stderr)
        raise SystemExit(1)
    if args.check:
        print("docs match benchmark JSONs")


if __name__ == "__main__":
    main()
