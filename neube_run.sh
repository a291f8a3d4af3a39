#!/bin/bash
# Serve the interactive drawing UI.
# Usage: ./neube_run.sh <gan_checkpoint> [port] [libraries-spec] [extra args...]
# Extra args are passed to the server (e.g. --device_canvas for the
# one-dispatch-per-stroke device-resident feature canvas).
set -e
SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
CKPT="${1:-}"
PORT="${2:-8000}"
LIBS="${3:-Default:random:default}"
shift $(( $# > 3 ? 3 : $# ))
ARGS=(--port="$PORT" --libraries="$LIBS")
if [ -n "$CKPT" ]; then ARGS+=(--gan_checkpoint="$CKPT"); fi
python -m brushstroke_engine_tpu.ui.server "${ARGS[@]}" "$@"
