"""Full driver-style oracle sweep: run every queries() entry against its
oracle_sql() twin at a given sf dir and report mismatches.

Mirrors the grading driver's compare (sort columns by name, value-multiset
equality) with the normalizations the driver applies implicitly via
hashing of rendered values: DuckDB Decimal -> float, DATE -> naive
datetime, None-safe ordering.

Usage: python scripts/oracle_sweep.py [sf_dir] [only_query ...]
       python scripts/oracle_sweep.py --adversarial [only_query ...]
       python scripts/oracle_sweep.py --sample N --seed S [sf_dir]

--adversarial stages tests/adversarial_corpus.py (edge-case documents +
symlinked sf0.001 side tables) into a temp dir and sweeps against it.
--sample N --seed S sweeps a random-N subset, selected like the grading
driver samples its per-round CORRECTNESS queries (seeded shuffle of the
sorted names) — a fresh-seed attestation for queries the driver has not
hashed yet, without the full-sweep wall time.
--prefer-unhashed (with --sample) biases the pick toward names that NO
recorded hash run has covered yet: it reads every CORRECTNESS_r*.json
and BENCH/SAMPLE_SWEEP_r*.json, fills the sample from never-hashed
names first (seeded shuffle within the tier), then tops up from the
already-hashed pool — the r04-verdict #6 rotation ask.
"""
import datetime
import decimal
import json
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return datetime.datetime(v.year, v.month, v.day)
    if isinstance(v, float) and v != v:  # NaN -> stable token
        return "NaN"
    return v


def _key(row):
    return [(v is None, str(type(v)), v) for v in row]


def _multiset(df):
    cols = sorted(df.columns)
    rows = [tuple(_norm(v) for v in r) for r in df[cols].itertuples(index=False)]
    return cols, sorted(rows, key=_key)


def main():
    args = sys.argv[1:]
    sample_n, seed = None, 0
    if "--sample" in args:
        i = args.index("--sample")
        sample_n = int(args[i + 1])
        del args[i : i + 2]
    if "--seed" in args:
        i = args.index("--seed")
        seed = int(args[i + 1])
        del args[i : i + 2]
    prefer_unhashed = "--prefer-unhashed" in args
    if prefer_unhashed:
        args.remove("--prefer-unhashed")
    adversarial = "--adversarial" in args
    if adversarial:
        args.remove("--adversarial")
        import tempfile

        from tests.adversarial_corpus import build_adversarial_dir

        sf_dir = build_adversarial_dir(tempfile.mkdtemp(prefix="adv_sf_"))
        only = set(args)
    else:
        sf_dir = args[0] if args else "/root/testdata/sf0.01"
        only = set(args[1:])

    import duckdb

    import __spark_entry__ as m
    from search_engine_spark.session import get_spark

    spark = get_spark(parallelism=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    if adversarial:
        from tests.adversarial_corpus import register_oracle_views

        register_oracle_views(con, sf_dir)

    queries = m.queries()
    oracles = m.oracle_sql()
    if sample_n is not None:
        import random

        names = sorted(queries)
        rng = random.Random(seed)
        if prefer_unhashed:
            import glob
            import os

            import re

            hashed: set = set()
            for path in sorted(
                glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
            ):
                try:
                    with open(path) as fh:
                        rec = json.load(fh)
                except (OSError, ValueError):
                    continue
                if isinstance(rec, dict):
                    hashed.update(rec.keys())
            # attestation files come in two shapes: a JSON summary with
            # a "queries" name list (r04) or a sweep LOG ("<name> ok"
            # lines + a trailing {"bad": …} summary) (r05+) — try JSON
            # first, fall back to line-parsing
            line_re = re.compile(r"^([a-z0-9_]+) (ok|rows_only|MISMATCH)")
            for path in sorted(
                glob.glob(os.path.join(REPO, "BENCH", "SAMPLE_SWEEP_r*.json"))
            ):
                try:
                    with open(path) as fh:
                        text = fh.read()
                except OSError:
                    continue
                try:
                    rec = json.loads(text)
                    if isinstance(rec, dict):
                        hashed.update(rec.get("queries", []))
                        continue
                except ValueError:
                    pass
                for line in text.splitlines():
                    mm = line_re.match(line.strip())
                    if mm:
                        hashed.add(mm.group(1))
            fresh = [n for n in names if n not in hashed]
            rest = [n for n in names if n in hashed]
            rng.shuffle(fresh)
            rng.shuffle(rest)
            ordered = fresh + rest
            print(
                f"prefer-unhashed: {len(fresh)} never-hashed of "
                f"{len(names)} total",
                flush=True,
            )
        else:
            ordered = names[:]
            rng.shuffle(ordered)
        picked = set(ordered[:sample_n])
        queries = {k: v for k, v in queries.items() if k in picked}
        print(f"sampled {len(queries)}/{len(names)} (seed={seed})",
              flush=True)
    results, bad = {}, []
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sp = fn(spark, sf_dir).toPandas()
            if name not in oracles:
                results[name] = {
                    "status": "rows_only",
                    "spark_rows": len(sp),
                    "sec": round(time.time() - t0, 2),
                }
                continue
            du = con.sql(oracles[name]).df()
            scols, srows = _multiset(sp)
            ocols, orows = _multiset(du)
            ok = scols == ocols and srows == orows
            results[name] = {
                "status": "ok" if ok else "MISMATCH",
                "spark_rows": len(srows),
                "oracle_rows": len(orows),
                "sec": round(time.time() - t0, 2),
            }
            if not ok:
                bad.append(name)
                if scols != ocols:
                    results[name]["cols"] = {"spark": scols, "oracle": ocols}
                else:
                    diff_s = [r for r in srows if r not in orows][:3]
                    diff_o = [r for r in orows if r not in srows][:3]
                    results[name]["sample_spark_only"] = [
                        [str(v) for v in r] for r in diff_s
                    ]
                    results[name]["sample_oracle_only"] = [
                        [str(v) for v in r] for r in diff_o
                    ]
        except Exception as e:  # noqa: BLE001 - sweep must survive any query
            results[name] = {"status": "ERROR", "err": repr(e)[:300]}
            bad.append(name)
        print(name, results[name]["status"], flush=True)

    print(json.dumps({"bad": bad, "n": len(results), "seed": seed
                      if sample_n is not None else None}, indent=0))
    with open("/tmp/oracle_sweep.json", "w") as f:
        json.dump(results, f, indent=1, default=str)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
