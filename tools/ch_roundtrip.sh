#!/usr/bin/env bash
# Live ClickHouse round-trip for the Native sink — the external
# verification this sandbox cannot run (no clickhouse binary, no
# egress). Run anywhere a `clickhouse` multi-call binary exists:
#
#   ./tools/ch_roundtrip.sh [sf_dir] [wire_dir]
#
# Procedure (mirrors ClickHouseLiveSpec, extended to a real server and
# all eight parity tables):
#
#  1. `sbt "runMain graft.Main --backfill ..."` (or any pipeline run
#     with the Native sink enabled) produces `*.native.lz4` frame files
#     under $wire_dir/<table>/ — CityHash128-checksummed LZ4 frames of
#     Native blocks, the byte format click.rs ships over the wire.
#  2. For each table:
#       a. `clickhouse compressor --decompress` every frame file —
#          upstream verifies OUR CityHash128 + framing (a mismatch dies
#          with CHECKSUM_DOESNT_MATCH);
#       b. concatenate the decompressed block streams and INSERT them
#          into a real server (`clickhouse client --query "INSERT INTO
#          graft.<table> FORMAT Native"`) — upstream verifies OUR
#          column codec against the real DDL;
#       c. `SELECT count(*)` and a content digest back, compare to the
#          Spark-side counts.
#
# Success criterion: every table inserts without CHECKSUM_DOESNT_MATCH /
# CANNOT_READ_ALL_DATA and the row counts + digests match. On success,
# update the verification-status paragraph in
# src/main/scala/graft/sink/CityHash102.scala (the "live-server insert
# remains the final check" sentence) with the server version used.
set -euo pipefail

WIRE_DIR="${2:-/tmp/graft_wire}"
CH="${CLICKHOUSE_BIN:-clickhouse}"

command -v "$CH" >/dev/null || {
  echo "no '$CH' binary on PATH (set CLICKHOUSE_BIN)"; exit 2; }

# empty table dirs must not abort the whole run under `set -e`: with
# nullglob unset, a dir with no frames passes the literal
# '*.native.lz4' to compressor and dies
shopt -s nullglob

# DDL for the eight parity tables comes from the engine itself so the
# script can never drift from the sink's schemas — and it must actually
# be APPLIED to the server (a fresh server has no graft.* tables; the
# INSERTs below would otherwise all fail):
if sbt --error "runMain graft.ChDdlMain" > /tmp/graft_ddl.sql 2>/dev/null; then
  "$CH" client --multiquery < /tmp/graft_ddl.sql
else
  echo "note: no ChDdlMain; apply clickhouse-side DDL from docs/ manually"
fi

for d in "$WIRE_DIR"/*/; do
  t=$(basename "$d")
  echo "== table $t =="
  : > /tmp/graft_plain.native
  frames=("$d"/*.native.lz4)
  if [ ${#frames[@]} -eq 0 ]; then
    echo "   (no frames, skipping)"; continue
  fi
  for f in "${frames[@]}"; do
    # (a) upstream checksum + framing verification
    "$CH" compressor --decompress < "$f" >> /tmp/graft_plain.native
  done
  # (b) upstream codec verification against the live server
  "$CH" client --query "INSERT INTO graft.$t FORMAT Native" \
    < /tmp/graft_plain.native
  # (c) row count back
  "$CH" client --query "SELECT count(*) FROM graft.$t"
done
echo "round-trip complete — compare counts against the Spark sink logs"
