"""Generate a scaled-up replica of an sf directory for scaling studies.

``python tools/gen_scale.py [factor] [src] [dst]`` (defaults: 10,
/root/testdata/sf0.1, .scratch/sf1) writes ``factor`` key-shifted
copies of every table:

- every entity key (orderkey/custkey/partkey/suppkey/event_id/user_id/
  doc_id/vec_id) maps ``k -> k*factor + i`` consistently on BOTH sides
  of each foreign-key edge, so joins behave exactly as at the source
  scale but with ``factor``x the key cardinality;
- ``region``/``nation`` stay fixed (bounded dimensions, as in TPC-H);
- ``embeddings.label`` is shifted too: blocks keep their SIZE and grow
  in NUMBER — the scaling assumption the blocked near-dup operators
  are designed around;
- ``documents.text`` is alphabet-rotated per copy (length-preserving
  ``translate``), so texts remain internally realistic but shingles
  are copy-unique — a replicated corpus must not fabricate cross-copy
  near-duplicate pairs that a real 10x corpus would not contain.

Distributions, skew shape, and per-entity densities are preserved;
only cardinalities scale. Deterministic (no RNG at all).
"""

from __future__ import annotations

import os
import string
import sys

import duckdb

KEYED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id", "label"],
}
FIXED = ["region", "nation"]


def _rot(s: str, i: int) -> str:
    return s[i % 26:] + s[: i % 26]


def generate(factor: int, src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in FIXED:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    for t, keys in KEYED.items():
        parts = []
        for i in range(factor):
            repl = ", ".join(f"{k} * {factor} + {i} AS {k}" for k in keys)
            if t == "documents" and i > 0:
                # Rotate digits as well as letters: k-char shingles
                # containing ANY letter or digit must be copy-unique,
                # or minhash signatures of digit-heavy template docs
                # still collide across copies and the candidate-pair
                # count grows super-linearly as a pure data artifact
                # (observed: 21x pairs at 10x rows before digits were
                # included in the rotation; ~10x after).
                digits = string.digits
                rot_d = digits[i % 10:] + digits[: i % 10]
                repl += (
                    f", translate(text, '{lower}{upper}{digits}',"
                    f" '{_rot(lower, i)}{_rot(upper, i)}{rot_d}') AS text"
                )
            parts.append(
                f"SELECT * REPLACE ({repl}) FROM read_parquet('{src}/{t}.parquet')"
            )
        sql = " UNION ALL ".join(parts)
        con.execute(f"COPY ({sql}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".scratch", "sf1")
    )
    generate(factor, src, dst)
