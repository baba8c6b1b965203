#!/bin/bash
# Certification ledger for the r8/r12 hard rule: NOTHING enters a
# snapshot commit unverified.
#
#   tools/certify.sh --stamp "note"   record HEAD as Verify-certified.
#                                     Run ONLY in the same turn as a
#                                     green full Verify + selfcheck
#                                     (both SFs) at this exact tree.
#   tools/certify.sh                  check: exits 0 iff src/main (and
#                                     the driver contract) is byte-
#                                     identical to the last certified
#                                     SHA; prints the drift otherwise.
#
# The end-of-round procedure is: run this check FIRST; if it fails,
# run Verify + selfcheck, then --stamp, then snapshot. r12 died by
# skipping exactly this (pHash promoted inside the snapshot commit,
# two red gates).
set -euo pipefail
cd "$(dirname "$0")/.."
LEDGER=CERTIFIED
if [[ "${1:-}" == "--stamp" ]]; then
  sha=$(git rev-parse HEAD)
  dirty=$(git status --porcelain -- src/main | wc -l)
  if [[ "$dirty" != "0" ]]; then
    echo "REFUSED: src/main has uncommitted changes — commit first, then stamp." >&2
    exit 1
  fi
  echo "$sha $(date -u +%Y-%m-%dT%H:%M:%SZ) ${2:-}" >> "$LEDGER"
  echo "certified $sha"
  exit 0
fi
if [[ ! -f "$LEDGER" ]]; then
  echo "UNCERTIFIED: no $LEDGER ledger yet — run a full Verify + selfcheck, then --stamp." >&2
  exit 1
fi
last=$(tail -1 "$LEDGER" | cut -d' ' -f1)
# A stamp whose SHA no longer resolves (history rewrite, shallow clone)
# must fail CLOSED: `git diff --name-only <unknown>` would error inside
# the substitution, drift would evaluate empty, and the check would
# print a false-positive OK — from the tool whose whole job is drift.
if ! git cat-file -e "$last^{commit}" 2>/dev/null; then
  echo "UNCERTIFIED: last certified SHA $last is unknown to this clone" >&2
  echo "(history rewrite or shallow clone?) — re-verify and --stamp." >&2
  exit 1
fi
drift=$( (git diff --name-only "$last" -- src/main build.sbt; git status --porcelain -- src/main build.sbt | awk '{print $2}') | sort -u )
if [[ -z "$drift" ]]; then
  echo "OK: tree matches certified $last"
  exit 0
fi
echo "UNCERTIFIED drift since $last:" >&2
echo "$drift" >&2
echo "Run full Verify + selfcheck (both SFs), then tools/certify.sh --stamp." >&2
exit 1
