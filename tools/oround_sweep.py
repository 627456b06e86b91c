#!/usr/bin/env python3
"""One-shot sweep: rewrite two-arg round(EXPR, N) in oracle SQL strings to
the explicit sign/floor/abs arithmetic that graft.dround executes, so any
DuckDB version evaluates the identical IEEE expression:

    round(EXPR, N)  ->  (sign(EXPR) * floor(abs(EXPR) * 10^N.0 + 0.5) / 10^N.0)

Why: DuckDB changed double round() half-boundary behavior across releases
(the q_token_budget r5 failure); the Spark side already pins its semantics
via graft.dround, so the oracle must spell out the same arithmetic.

Skips: single-arg round (integer quantization lambdas — both engines
compute those natively and they are not dround-paired), dround/graft_round,
Scala-side round(col(...)), and q15's round(total_revenue, 2) which rounds
an exact DECIMAL (version-stable already; wrapping it in sign/abs would
change its type).
"""
import re
import sys
from pathlib import Path

FILES = [
    "src/main/scala/graft/queries/PipelineQueries.scala",
    "src/main/scala/graft/queries/RelationalQueries.scala",
    "src/main/scala/graft/queries/EventQueries.scala",
    "src/main/scala/graft/queries/AqpQueries.scala",
    "src/main/scala/graft/queries/MutationQueries.scala",
    "src/main/scala/graft/queries/SecurityQueries.scala",
    "src/main/scala/graft/queries/TpchQueries.scala",
    "src/main/scala/graft/queries/TpchQueries2.scala",
    "src/main/scala/graft/queries/TpchQueries3.scala",
]


def convert_once(text):
    """Find the first convertible two-arg round( and rewrite it.
    Returns (new_text, True) or (text, False)."""
    for m in re.finditer(r"(?<![\w.])round\(", text):
        start = m.start()
        i = m.end()
        depth = 1
        in_str = False
        top_commas = []
        while i < len(text) and depth > 0:
            c = text[i]
            if c == "'":
                in_str = not in_str
            elif not in_str:
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                elif c == "," and depth == 1:
                    top_commas.append(i)
            i += 1
        if depth != 0 or len(top_commas) != 1:
            continue  # unbalanced (shouldn't happen) or single-arg
        end = i  # one past ')'
        expr = text[m.end():top_commas[0]]
        scale_raw = text[top_commas[0] + 1:end - 1]
        scale = scale_raw.strip()
        if not re.fullmatch(r"\d", scale):
            continue  # not a literal single-digit scale
        stripped = re.sub(r"\s*\|", " ", expr).strip()  # drop Scala margins
        if 'col("' in stripped or ".as(" in stripped:
            continue  # Scala-side round, not oracle SQL
        if stripped == "total_revenue":
            continue  # q15: DECIMAL round, exact in every DuckDB
        if re.fullmatch(r"sum\(CAST\(.+ AS DECIMAL\(\d+,\s*\d+\)\)\)", stripped):
            continue  # DECIMAL-typed sum: round() is exact decimal
            # arithmetic, version-stable, and matches decSum bit-for-bit;
            # pushing it through double would MISS .xx50 boundaries
        p = "1" + "0" * int(scale) + ".0"
        new = f"(sign({expr.strip()}) * floor(abs({expr.strip()}) * {p} + 0.5) / {p})"
        return text[:start] + new + text[end:], True
    return text, False


def main():
    root = Path(__file__).resolve().parent.parent
    total = 0
    for rel in FILES:
        path = root / rel
        text = path.read_text()
        n = 0
        while True:
            text, changed = convert_once(text)
            if not changed:
                break
            n += 1
            if n > 500:
                sys.exit(f"runaway in {rel}")
        if n:
            path.write_text(text)
        print(f"{rel}: {n} converted")
        total += n
    print(f"total: {total}")


if __name__ == "__main__":
    main()
