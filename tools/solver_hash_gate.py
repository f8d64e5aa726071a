"""Bit-exactness gate for core-solver refactors: md5 over the SORTED
solver outputs (surface, char offset, entity, score rounded 1e-12,
candidate map rounded 1e-12) of 2000 synthetic conversations under four
configs (graph / local / prior / fuzzy). Any optimization of
aida_spark/core must leave the TOTAL hash unchanged — the driver
oracles hash query results, so a 1-ulp drift anywhere is a regression.

Usage: python tools/solver_hash_gate.py   (run before AND after a core
change; compare the TOTAL lines). Round-6 reference on this corpus:
TOTAL 26167f8fdb95bf70c4885e5bc7b7da9b — but always regenerate the
before-hash from the pre-change tree rather than trusting a constant
(fixture changes move it legitimately).
"""
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aida_spark.fixtures import build_kb, synth_transcripts
from aida_spark.core.disambiguate import (
    DisambiguationConfig,
    disambiguate_document,
    prepare,
)


def main() -> None:
    kb = build_kb()
    cfgs = {
        "graph": DisambiguationConfig(),
        "local": DisambiguationConfig(technique="local"),
        "prior": DisambiguationConfig(technique="prior"),
        "fuzzy": DisambiguationConfig(fuzzy_min_sim=0.3),
    }
    pdf = synth_transcripts(2000, 8, seed=42, hot_key_skew=0.2)
    convs: dict = {}
    for conv_id, turn_idx, text in zip(
        pdf["conv_id"], pdf["turn_idx"], pdf["text"]
    ):
        convs.setdefault(conv_id, []).append((turn_idx, text))
    docs = sorted(
        (cid, "\n".join(t for _, t in sorted(turns)))
        for cid, turns in convs.items()
    )
    t0 = time.time()
    h = hashlib.md5()
    for name, cfg in cfgs.items():
        rows = []
        for cid, text in docs:
            doc = prepare(
                cid, text, kb,
                include_unknown_caps=(cfg.fuzzy_min_sim > 0),
            )
            for r in disambiguate_document(doc, kb, cfg):
                rows.append((
                    cid, r.mention.surface, r.mention.char_offset,
                    r.entity, round(r.score, 12),
                    tuple(sorted(
                        (k, round(v, 12)) for k, v in r.candidates.items()
                    )),
                ))
        rows.sort()
        h.update(repr(rows).encode())
        print(f"{name}: {len(rows)} rows, cumhash {h.hexdigest()}")
    print(f"TOTAL {h.hexdigest()}  ({time.time() - t0:.2f}s)")


if __name__ == "__main__":
    main()
