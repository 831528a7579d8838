#!/usr/bin/env python3
"""Seeded perturbation FUZZ over the query↔oracle triangle (r11
verdict #8): the fixed sf0.001 fixtures cannot exercise semantics they
never contain, so plant the classic nasties — NULLs, empty and unicode
strings, duplicate ids, zero (degenerate, NaN-free) vectors, rounding-
boundary values, timestamp ties — into a variant of every table, then
run the FULL registry (graft.Verify) against the variant and compare
every query to its DuckDB oracle on the SAME variant (selfcheck). Both
engines read identical bytes, so any divergence is an engine-semantics
mismatch (NULL ordering, unicode collation, rounding mode, overflow),
exactly the bug class the fixed fixtures are blind to.

Perturbation is APPEND-ONLY (never modifies or deletes driver rows):
point-lookup fixtures (vdb_query_by_id ids 3/17/42, spell typo
fixtures, planted near-dup pairs) stay intact, and the planted rows
live in a 900000+ id band far from the driver's.

Usage: fuzz_oracle.py <seed> [<seed> ...]
Writes variants under target/fuzz/seed<k>/, runs Verify + selfcheck
per seed, exits nonzero on the first red seed.
"""
import os, random, subprocess, sys
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.001"
BAND = 900000
# Bump when perturb() changes: the variant DIR PATH keys every
# persisted structure the library builds under target/tmp (indexes,
# codebooks, signature tables), so new generator output under an old
# path would serve STALE artifacts built from the previous variant.
# v3 (r16, VERDICT r15 #2): targeted plants for the r15 surfaces —
# phrase-boundary docs (multi-space gap, whole-text phrase, prefix
# near-miss) with matching embedding ids so they flow through the
# kNN phrase filters, and datetime-window-edge events (first micro
# inside, exclusive end, last micro inside) likewise id-paired.
VARIANT_VERSION = 3

# unicode stress strings: NFC/NFD pairs, CJK, RTL, emoji, combining
# marks, zero-width joiners, whitespace-only
UNI = [
    "café touché",                  # NFC
    "café touché",                # NFD of the same text
    "中文文档 测试",  # CJK
    "مرحبا بالعالم",  # RTL
    "emoji \U0001f600\U0001f680 mix",
    "zero​width‍joined",
    "à́̂ stacked marks",
    "   ",                                     # whitespace-only
    "",                                        # empty
]


def perturb(seed: int, outdir: str) -> None:
    rng = random.Random(seed)
    os.makedirs(outdir, exist_ok=True)

    def emit(name, rows_builder):
        t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        extra = rows_builder(t)
        if extra:
            cols = {f.name: [r.get(f.name) for r in extra] for f in t.schema}
            add = pa.table(
                {n: pa.array(v, type=t.schema.field(n).type)
                 for n, v in cols.items()})
            t = pa.concat_tables([t, add])
        pq.write_table(t, os.path.join(outdir, f"{name}.parquet"))

    def docs(t):
        rows = []
        for i, txt in enumerate(UNI):
            rows.append(dict(doc_id=BAND + i, text=txt,
                             lang=rng.choice(["en", "de", None]),
                             source=rng.choice(["web", None]),
                             n_chars=len(txt)))
        # NULL text, a very long repetitive doc, and a duplicate of an
        # existing doc's text under a new id (exact-dup path)
        base = t.column("text")[rng.randrange(len(t))].as_py()
        rows.append(dict(doc_id=BAND + 50, text=None, lang=None,
                         source=None, n_chars=None))
        rows.append(dict(doc_id=BAND + 51, text="spam " * 400,
                         lang="en", source="web", n_chars=2000))
        rows.append(dict(doc_id=BAND + 52, text=base, lang="en",
                         source="mirror", n_chars=len(base or "")))
        # r16: phrase-filter boundary surface (ids pair with planted
        # embeddings below so the kNN phrase filters see them):
        # phrase mid-text, DOUBLE-space gap (tokens not adjacent —
        # must NOT match), the phrase as the entire text (padding
        # edges), and a prefix near-miss sharing a token
        for off, txt in [(53, "alpha table value beta"),
                         (54, "alpha table  value beta"),
                         (55, "table value"),
                         (56, "tablex value table rows")]:
            rows.append(dict(doc_id=BAND + off, text=txt, lang="en",
                             source="web", n_chars=len(txt)))
        return rows

    def embs(t):
        dim = len(t.column("embedding")[0].as_py())
        rows = [
            # zero vector (degenerate: cosine NULL paths), NaN-free
            dict(vec_id=BAND, embedding=[0.0] * dim, label=0),
            # constant vector and a duplicate of vec 0 under a new id
            dict(vec_id=BAND + 1, embedding=[1.0] * dim,
                 label=rng.randrange(10)),
            dict(vec_id=BAND + 2,
                 embedding=t.column("embedding")[0].as_py(), label=5),
            # large-magnitude vector (boundary stress, within the
            # embedding-audit domain: norm micro-quantization holds
            # round(norm·1e4) in BIGINT, exact to norm < ~9e14 —
            # coords here give norm ~8e3; a 1e15-coord plant verified
            # the out-of-domain behavior is a loud ANSI CAST_OVERFLOW,
            # not silent corruption)
            dict(vec_id=BAND + 3,
                 embedding=[rng.uniform(1e2, 1e3) for _ in range(dim)],
                 label=1),
        ]
        # r16: ids pairing with the phrase-boundary docs (+53..56)
        # and the datetime-edge events (+30..32), so the r15 filter
        # fixtures' joins carry the planted boundary rows into the
        # distance kernel; ordinary unit-scale vectors so they can
        # genuinely enter top-10s
        for off in [30, 31, 32, 53, 54, 55, 56]:
            rows.append(dict(
                vec_id=BAND + off,
                embedding=[rng.uniform(-1.0, 1.0) for _ in range(dim)],
                label=rng.randrange(10)))
        return rows

    def events(t):
        ts0 = t.column("ts")[0].as_py()
        et = t.column("event_type")[0].as_py()
        rows = []
        # timestamp ties: several events, same user, same instant
        for i in range(4):
            rows.append(dict(event_id=BAND + i, ts=ts0,
                             user_id=BAND + 1, event_type=et,
                             value=round(rng.uniform(0, 100), 2),
                             props=None))
        # duplicate event_id (idempotence/grouping stress)
        rows.append(dict(event_id=BAND, ts=ts0, user_id=BAND + 1,
                         event_type=et, value=1.0, props="{}"))
        # rounding-boundary and extreme values (micro-unit paths).
        # Magnitude stays inside the micro-unit stats family's
        # DOCUMENTED domain (|value| ≤ ~1e6: the moments pipeline
        # holds Σ m⁴ in DECIMAL(38,0), which is exact to |m| < 10^9.5
        # micro-cents — beyond that the operators FAIL LOUD by ANSI
        # design rather than corrupt silently; a 1e9 plant verified
        # exactly that, throwing NUMERIC_VALUE_OUT_OF_RANGE)
        for i, v in enumerate([0.005, 0.015, 0.125, -3.545, 1e6 + 0.5]):
            rows.append(dict(event_id=BAND + 10 + i, ts=ts0,
                             user_id=BAND + 2,
                             event_type=rng.choice([et, "zürich"]),
                             value=v, props=""))
        # NULL value and NULL props
        rows.append(dict(event_id=BAND + 20, ts=ts0, user_id=BAND + 3,
                         event_type=et, value=None, props=None))
        # r16: datetime-filter WINDOW-EDGE instants (the r15
        # vdb_knn_filtered_datetime window is
        # ['2024-01-01 01:00:00', '2024-01-02 00:00:00')): the first
        # micro inside, the exclusive end (must NOT match), and the
        # last whole micro inside — event ids pair with planted
        # embeddings so the rows reach the filter
        import datetime as _dt
        for off, inst in [
                (30, _dt.datetime(2024, 1, 1, 1, 0, 0, 0)),
                (31, _dt.datetime(2024, 1, 2, 0, 0, 0, 0)),
                (32, _dt.datetime(2024, 1, 1, 23, 59, 59, 999999))]:
            rows.append(dict(event_id=BAND + off, ts=inst,
                             user_id=BAND + 4, event_type=et,
                             value=1.0, props='{"k": "edge"}'))
        return rows

    def orders(t):
        d0 = t.column("o_orderdate")[0].as_py()
        # an order with no lineitems (left-join / anti-join paths) and
        # a zero-price order (division-by-total paths)
        return [
            dict(o_orderkey=BAND, o_custkey=BAND,
                 o_orderstatus="O", o_totalprice=0.0,
                 o_orderdate=d0, o_orderpriority="1-URGENT"),
        ]

    def lineitem(t):
        d0 = t.column("l_shipdate")[0].as_py()
        ok = t.column("l_orderkey")[0].as_py()
        # boundary quantities/discounts on an EXISTING order, plus a
        # lineitem whose order key has no orders row (dangling FK)
        return [
            dict(l_orderkey=ok, l_partkey=BAND, l_suppkey=1,
                 l_linenumber=90, l_quantity=0.0, l_extendedprice=0.0,
                 l_discount=0.0, l_tax=0.0, l_returnflag="N",
                 l_linestatus="O", l_shipdate=d0),
            dict(l_orderkey=BAND + 77, l_partkey=BAND, l_suppkey=1,
                 l_linenumber=1, l_quantity=50.0,
                 l_extendedprice=1e7, l_discount=1.0, l_tax=0.08,
                 l_returnflag="R", l_linestatus="F", l_shipdate=d0),
        ]

    def ident(_):
        return []

    emit("documents", docs)
    emit("embeddings", embs)
    emit("events", events)
    emit("orders", orders)
    emit("lineitem", lineitem)
    for name in ["customer", "supplier", "part", "nation", "region"]:
        emit(name, ident)


def run_seed(seed: int) -> bool:
    import shutil
    vdir = os.path.join(REPO, "target", "fuzz",
                        f"seed{seed}v{VARIANT_VERSION}")
    outdir = os.path.join(REPO, "target", "fuzz", f"out{seed}")
    shutil.rmtree(outdir, ignore_errors=True)
    perturb(seed, vdir)
    print(f"[fuzz] seed {seed}: variant at {vdir}, running Verify ...")
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {vdir} {outdir}"],
        cwd=REPO, capture_output=True, text=True,
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"})
    threw = [l for l in r.stderr.splitlines() + r.stdout.splitlines()
             if "[verify]" in l]
    for l in threw:
        print(" ", l)
    print(f"[fuzz] seed {seed}: comparing to DuckDB oracle ...")
    c = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "selfcheck.py"),
         vdir, outdir],
        capture_output=True, text=True)
    lines = c.stdout.splitlines()
    bad = [l for l in lines if l.startswith("FAIL")]
    # a query that THREW on the variant is a finding too
    ok = not bad and not threw and any("RESULT: PASS" in l for l in lines)
    for l in bad:
        print(" ", l)
    print(f"[fuzz] seed {seed}: {'PASS' if ok else 'RED'} "
          f"({sum(1 for l in lines if l.startswith('OK'))} OK rows)")
    return ok


if __name__ == "__main__":
    seeds = [int(a) for a in sys.argv[1:]] or [1, 2, 3]
    red = [s for s in seeds if not run_seed(s)]
    if red:
        print(f"[fuzz] RED seeds: {red}")
        sys.exit(1)
    print(f"[fuzz] all {len(seeds)} seeds green")
