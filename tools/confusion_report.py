"""Per-token confusion report from an eval pairs dump.

Input: the JSONL written by ``test_model(..., pairs_out=...)`` (one line per
row: pad-stripped ``pred``/``gold`` token-id lists; produced via
``tools/eval_full_split.py --pairs_out`` or
``python -m texocr_tpu.evaluation.cli --pairs_out``).

Each pred/gold pair is aligned with a standard Levenshtein backtrace
(substitution cost 1) and the aligned edit operations are tabulated:

- substitutions: gold token -> predicted token, counted pairwise
- insertions / deletions per token
- per-gold-token error rate (how often each vocabulary token is misread)

This is the diagnosis tool VERDICT r3 asked for — it is what localized the
stage-U typeset failure to ``^``/``_`` confusion on digit bases (the
mathtext renderer collapsed sup and sub for scripted digits; see
render_data.compact_latex and RESULTS.md "Typeset accuracy").

Usage:
  python tools/confusion_report.py /tmp/pairs.jsonl [--top 30] \
      [--tokenizer texocr_tpu/tokenizer/tokenizer_clean_1k.txt]
"""

import argparse
import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def align_ops(pred, gold):
    """Levenshtein alignment ops: yields ('sub', g, p) / ('del', g) /
    ('ins', p) for the minimum-cost alignment (matches are skipped)."""
    n, m = len(gold), len(pred)
    # DP over (n+1) x (m+1); n,m are a few hundred — plain Python is fine
    # at full-split scale (7k rows x ~150 tokens ~= a minute).
    prev = list(range(m + 1))
    back = [[0] * (m + 1) for _ in range(n + 1)]  # 0 diag, 1 up(del), 2 left(ins)
    back[0] = [2] * (m + 1)
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        back[i][0] = 1
        gi = gold[i - 1]
        for j in range(1, m + 1):
            c_diag = prev[j - 1] + (gi != pred[j - 1])
            c_del = prev[j] + 1
            c_ins = cur[j - 1] + 1
            best = min(c_diag, c_del, c_ins)
            cur[j] = best
            back[i][j] = 0 if best == c_diag else (1 if best == c_del else 2)
        prev = cur
    i, j, ops = n, m, []
    while i > 0 or j > 0:
        b = back[i][j]
        if i > 0 and j > 0 and b == 0:
            if gold[i - 1] != pred[j - 1]:
                ops.append(("sub", gold[i - 1], pred[j - 1]))
            i, j = i - 1, j - 1
        elif i > 0 and b == 1:
            ops.append(("del", gold[i - 1]))
            i -= 1
        else:
            ops.append(("ins", pred[j - 1]))
            j -= 1
    return ops


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("pairs", help="JSONL from test_model(pairs_out=...)")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--tokenizer", default=None,
                   help="tokenizer file to decode ids (default: shipped 1k)")
    args = p.parse_args()

    from texocr_tpu.tokenizer import DEFAULT_VOCAB_PATH, RegexBPETokenizer

    tok = RegexBPETokenizer()
    tok.load(args.tokenizer or DEFAULT_VOCAB_PATH)

    def name(tid):
        try:
            return repr(tok.decode([tid]))
        except (KeyError, ValueError):
            return f"<id {tid}>"

    subs, dels, ins = Counter(), Counter(), Counter()
    gold_count = Counter()
    rows = toks = errs = 0
    with open(args.pairs) as f:
        for line in f:
            d = json.loads(line)
            pred, gold = d["pred"], d["gold"]
            rows += 1
            toks += len(gold)
            gold_count.update(gold)
            for op in align_ops(pred, gold):
                errs += 1
                if op[0] == "sub":
                    subs[(op[1], op[2])] += 1
                elif op[0] == "del":
                    dels[op[1]] += 1
                else:
                    ins[op[1]] += 1

    print(f"rows: {rows}  gold tokens: {toks}  edit errors: {errs} "
          f"({errs / max(toks, 1):.2%} of gold tokens)")
    n_sub = sum(subs.values())
    print(f"  substitutions: {n_sub}  deletions: {sum(dels.values())}  "
          f"insertions: {sum(ins.values())}")
    print(f"\ntop {args.top} substitutions (gold -> pred):")
    for (g, pr), c in subs.most_common(args.top):
        print(f"  {c:7d}  {c / max(n_sub, 1):6.2%}  "
              f"{name(g)} -> {name(pr)}")
    print(f"\ntop {args.top} deletions (gold token dropped):")
    for g, c in dels.most_common(args.top):
        print(f"  {c:7d}  {name(g)}")
    print(f"\ntop {args.top} insertions (spurious pred token):")
    for pr, c in ins.most_common(args.top):
        print(f"  {c:7d}  {name(pr)}")
    print(f"\nper-token error rate (gold tokens with >=100 occurrences):")
    err_by_gold = Counter()
    for (g, _), c in subs.items():
        err_by_gold[g] += c
    for g, c in dels.items():
        err_by_gold[g] += c
    rates = [(err_by_gold[g] / gold_count[g], g)
             for g in gold_count if gold_count[g] >= 100]
    for rate, g in sorted(rates, reverse=True)[:args.top]:
        print(f"  {rate:6.2%}  {name(g)}  ({err_by_gold[g]}/{gold_count[g]})")


if __name__ == "__main__":
    main()
