#!/usr/bin/env bash
# WAL snapshot loop (reference parity: scripts/redb-snapshot.sh — snapshot
# the store every INTERVAL seconds, keep the newest KEEP copies, restore
# on boot). The WAL is append-only + CRC-framed, so a live copy is
# crash-consistent: replay stops at the last complete frame.
#
#   snapshot.sh backup  <data_dir> <backup_dir>   # one snapshot
#   snapshot.sh loop    <data_dir> <backup_dir>   # every $INTERVAL (300 s)
#   snapshot.sh restore <data_dir> <backup_dir>   # newest snapshot -> data_dir
set -euo pipefail

CMD="${1:?backup|loop|restore}"
DATA_DIR="${2:?data dir}"
BACKUP_DIR="${3:?backup dir}"
INTERVAL="${INTERVAL:-300}"
KEEP="${KEEP:-24}"

backup_once() {
  mkdir -p "$BACKUP_DIR"
  local ts
  ts="$(date -u +%Y%m%dT%H%M%SZ)"
  cp "$DATA_DIR/ucfp.wal" "$BACKUP_DIR/ucfp-$ts.wal"
  # prune to the newest $KEEP
  ls -1t "$BACKUP_DIR"/ucfp-*.wal 2>/dev/null | tail -n +$((KEEP + 1)) |
    xargs -r rm -f
  echo "snapshot: $BACKUP_DIR/ucfp-$ts.wal"
}

case "$CMD" in
  backup) backup_once ;;
  loop) while true; do backup_once || true; sleep "$INTERVAL"; done ;;
  restore)
    latest="$(ls -1t "$BACKUP_DIR"/ucfp-*.wal 2>/dev/null | head -1 || true)"
    if [ -n "$latest" ]; then
      mkdir -p "$DATA_DIR"
      cp "$latest" "$DATA_DIR/ucfp.wal"
      echo "restored: $latest"
    else
      echo "no snapshot to restore"
    fi
    ;;
  *) echo "unknown command $CMD" >&2; exit 2 ;;
esac
