#!/usr/bin/env python3
"""Regenerate the claim numbers in README.md / SURVEY.md from artifacts.

The battery count comes from a correctness artifact (either the driver's
CORRECTNESS_r*.json or a local Verify dump replayed through
tools/compare.py); the test count comes from target/test-reports/*.xml.
Claims live between `<!--claims:NAME-->`/`<!--/claims:NAME-->` markers
and this script is the ONLY writer inside them — the numbers cannot be
hand-edited into drift again (rounds 14-16 each shipped stale
hand-maintained counts).

Usage:
  python3 tools/update_claims.py --correctness CORRECTNESS_r16.json
  python3 tools/update_claims.py --verify-out /tmp/vout --sf /root/testdata/sf0.01
  python3 tools/update_claims.py --check   # with either source: exit 1 on drift

The round number is inferred from the newest CORRECTNESS_r*.json name
unless --round is given.
"""
import argparse
import glob
import json
import os
import re
import subprocess
import sys
import xml.etree.ElementTree as ET

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def battery_from_correctness(path):
    data = json.load(open(path))
    total = len(data)
    green = sum(1 for v in data.values()
                if v.get("rows_match") and v.get("schema_match") and v.get("hash_match"))
    no_oracle = sum(1 for v in data.values() if v.get("err") == "no_oracle")
    return green, total - no_oracle, total, no_oracle


def battery_from_verify(sf_dir, out_dir):
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "compare.py"), sf_dir, out_dir],
        capture_output=True, text=True)
    m = re.search(r"(\d+)/(\d+) queries match", proc.stdout)
    if not m:
        raise SystemExit(f"compare.py verdict line not found:\n{proc.stdout[-2000:]}")
    green, oracled = int(m.group(1)), int(m.group(2))
    dumped = sum(1 for d in os.listdir(out_dir)
                 if os.path.isdir(os.path.join(out_dir, d)))
    # A name-filtered Verify dump (the documented fast local loop) still
    # writes the FULL oracle_sql.json, so compare.py reports the whole
    # registry as its denominator; splicing claims from such a dump would
    # silently write a negative rows-only count into README/SURVEY.
    if dumped < oracled:
        raise SystemExit(
            f"{out_dir} looks like a PARTIAL Verify dump ({dumped} results vs "
            f"{oracled} oracled queries) — re-run graft.Verify with no name "
            "filter before splicing claims")
    return green, oracled, dumped, dumped - oracled


def test_counts():
    tests = failures = suites = 0
    for f in glob.glob(os.path.join(ROOT, "target", "test-reports", "*.xml")):
        root = ET.parse(f).getroot()
        suites += 1
        tests += int(root.get("tests", 0))
        failures += int(root.get("failures", 0)) + int(root.get("errors", 0))
    if suites == 0:
        raise SystemExit("no target/test-reports/*.xml — run `sbt test` first")
    return tests, failures, suites


def infer_round():
    rounds = [int(m.group(1)) for f in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))
              if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", f))]
    return max(rounds) + 1 if rounds else 0


def splice(path, name, text, check):
    src = open(path).read()
    pat = re.compile(f"(<!--claims:{name}-->).*?(<!--/claims:{name}-->)", re.S)
    if not pat.search(src):
        raise SystemExit(f"{path}: missing markers claims:{name}")
    out = pat.sub(lambda m: m.group(1) + text + m.group(2), src)
    if out != src:
        if check:
            print(f"DRIFT in {os.path.basename(path)} claims:{name} -> {text}")
            return False
        open(path, "w").write(out)
        print(f"updated {os.path.basename(path)} claims:{name} -> {text}")
    else:
        print(f"ok      {os.path.basename(path)} claims:{name}")
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--correctness", help="driver CORRECTNESS_r*.json artifact")
    ap.add_argument("--verify-out", help="local graft.Verify output dir")
    ap.add_argument("--sf", help="sf dir for --verify-out (default sf0.01)",
                    default="/root/testdata/sf0.01")
    ap.add_argument("--round", type=int, help="round number for the claim text")
    ap.add_argument("--check", action="store_true",
                    help="fail instead of writing when claims drifted")
    args = ap.parse_args()

    if args.verify_out:
        green, oracled, total, no_oracle = battery_from_verify(args.sf, args.verify_out)
        rnd = args.round if args.round is not None else infer_round()
    elif args.correctness:
        green, oracled, total, no_oracle = battery_from_correctness(args.correctness)
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", args.correctness)
        rnd = args.round if args.round is not None else (int(m.group(1)) if m else infer_round())
    else:
        raise SystemExit("need --correctness FILE or --verify-out DIR")

    tests, failures, suites = test_counts()

    # "no-oracle", not "rows-only": the driver checks NOTHING about a query
    # with no oracleSql entry (rows_match comes back null, not rows-verified)
    battery = (f"{green} of {oracled} oracle-checked battery queries hash-match "
               f"at sf0.01 as of round {rnd} ({total} total; {no_oracle} "
               f"no-oracle by design)")
    testline = f"`sbt test` {tests}/{failures} across {suites} suites"

    ok = True
    ok &= splice(os.path.join(ROOT, "README.md"), "battery", battery, args.check)
    ok &= splice(os.path.join(ROOT, "SURVEY.md"), "battery", battery, args.check)
    ok &= splice(os.path.join(ROOT, "SURVEY.md"), "tests", testline, args.check)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
