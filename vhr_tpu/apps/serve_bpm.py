"""Serve live BPM over TCP: many camera clients, one chip.

CLI front-end for :mod:`vhr_tpu.serving` — the production counterpart of
the reference's one-camera-per-process live app
(``/root/reference/rppg_LIVESTREAM.py:256-366``): ``n_slots`` clients
connect over TCP, their frames batch into ONE device dispatch per tick,
and each gets its own per-frame JSON BPM line back (protocol documented
in ``vhr_tpu/serving.py``).

    python -m vhr_tpu.apps.serve_bpm --height 720 --width 1280 \
        --slots 16 --detector mediapipe --port 7117

A client is ~10 lines (``serving.BpmClient``): send a JSON hello, then
length-prefixed raw BGR (or planar I420) frames; read JSON lines.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="vhr_tpu multi-client live BPM server")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=7117,
                   help="0 picks an ephemeral port (printed at startup)")
    p.add_argument("--height", type=int, required=True,
                   help="pool frame height (clients resize to this)")
    p.add_argument("--width", type=int, required=True)
    p.add_argument("--slots", type=int, default=8,
                   help="concurrent clients per chip")
    p.add_argument("--fps", type=float, default=30.0,
                   help="nominal client frame rate (Welch timebase)")
    p.add_argument("--detector", default="skin",
                   help="skin|landmarker|landmarker-real|refined|mediapipe|"
                        "mediapipe-bf16|mediapipe-exact")
    p.add_argument("--detect-every", type=int, default=1,
                   help="pool-tick detection cadence (the whole batched "
                        "detector pass cond-skips off-phase ticks; "
                        "tracking holds between attempts)")
    p.add_argument("--faces", type=int, default=1,
                   help="subjects monitored per client slot (K-track "
                        "identity-matched holdover)")
    p.add_argument("--transfer", choices=("bgr", "i420"), default="bgr",
                   help="wire format clients must send (i420 = 2x fewer "
                        "bytes; see serving.py protocol)")
    p.add_argument("--max-seconds", type=float, default=None,
                   help="serve for a bounded time then exit (smoke tests, "
                        "draining deploys); default: forever")
    p.add_argument("--restore", default=None, metavar="NPZ",
                   help="restore pool state from a snapshot (.npz) — "
                        "clients resume mid-acquisition after a restart")
    p.add_argument("--snapshot-on-exit", default=None, metavar="NPZ",
                   help="save pool state on shutdown (pair with --restore)")
    args = p.parse_args(argv)

    from ..pipeline import live
    from ..serving import BpmServer, serve_forever
    from .rppg_video import _resolve_detector, _resolve_detector_multi

    detector = (_resolve_detector(args.detector) if args.faces == 1
                else _resolve_detector_multi(args.detector, args.faces))
    cfg = live.LiveConfig(fps=args.fps, detect_every=args.detect_every)
    pool = BpmServer(cfg, n_slots=args.slots, detector=detector,
                     transfer=args.transfer, k_faces=args.faces)
    if args.restore:
        import numpy as np
        with np.load(args.restore) as snap:
            pool.restore(snap)
        print(f"restored pool state from {args.restore} "
              f"({len(pool.active_slots)} live slots)")
    srv = serve_forever(args.host, args.port, pool,
                        frame_shape=(args.height, args.width))
    host, port = srv.server_address[:2]
    print(f"serving {args.slots} slots of {args.width}x{args.height} "
          f"({args.transfer}, detector={args.detector}) on {host}:{port}")
    try:
        import threading
        threading.Event().wait(args.max_seconds)   # None = forever
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
        if args.snapshot_on_exit:
            import numpy as np
            np.savez(args.snapshot_on_exit, **pool.snapshot())
            print(f"pool state -> {args.snapshot_on_exit}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
