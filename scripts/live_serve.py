"""Live serving demo: DCA1000 UDP capture -> reassembly -> streaming pose.

The full live topology the reference cannot express (it only post-processes
completed capture files):

    DCA1000 hori data port ─┐
                            ├─> PacketReassembler (C++ ring, zero-fill)
    DCA1000 vert data port ─┘        │ int16 I/Q planes (half-width wire)
                                     v
                    StreamingPoseEstimator (device DSP + MNet + pose)

    # against real capture hardware (one UDP port per radar view):
    python scripts/live_serve.py --hori-port 4098 --vert-port 4099 --frames 100

    # self-contained demo: a replay thread streams synthetic (or .bin)
    # captures over loopback sockets, packetized exactly like the card
    python scripts/live_serve.py --synthetic --frames 32
    python scripts/live_serve.py --replay path/to/single_1 --frames 64

Prints per-frame keypoints cadence, end-to-end fps, and reassembly stats
(drops / reorders / overflows)."""

import argparse
import os
import socket
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def replay_thread(stream: np.ndarray, port: int, payload: int, fps: float):
    """Packetize an int16 capture stream and send it over loopback at
    roughly `fps` frames/s (the card's own pacing)."""
    from hupr_tpu.data.capture import packetize

    def run():
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        # a brief sleep every burst keeps loopback from overrunning the
        # reader thread's socket buffer (a real card paces at `fps`)
        for i, pkt in enumerate(packetize(stream, payload)):
            tx.sendto(pkt, ("127.0.0.1", port))
            if i % 16 == 15:
                time.sleep(0.002)
        tx.close()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return t


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="mscsa_prgcn_tpu.yaml")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--hori-port", type=int, default=0)
    ap.add_argument("--vert-port", type=int, default=0)
    ap.add_argument("--synthetic", action="store_true",
                    help="replay a synthetic capture over loopback")
    ap.add_argument("--replay", default=None,
                    help="replay {dir}/{hori,vert}/adc_data.bin over loopback")
    ap.add_argument("--ring-frames", type=int, default=16,
                    help="reassembler ring depth (frames buffered per view)")
    ap.add_argument("--platform", default=None,
                    help="cpu forces the CPU backend (smoke runs)")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax

    from hupr_tpu.config import load_config, resolve_config_path
    from hupr_tpu.data.capture import (DEFAULT_PAYLOAD, UDPCaptureSource,
                                       stream_to_iq_planes)
    from hupr_tpu.engine.streaming import StreamingPoseEstimator
    from hupr_tpu.models import build_model
    from hupr_tpu.utils.synthetic import synthetic_variables

    cfg = load_config(resolve_config_path(args.config))
    if args.platform == "cpu" and \
            getattr(cfg.MODEL, "attention", "xla") == "pallas":
        # pallas kernels don't lower on the CPU backend (interpret mode
        # only); smoke runs get the XLA einsum attention instead
        print("live_serve: cpu platform — MODEL.attention pallas -> xla")
        cfg.MODEL.attention = "xla"
    d = cfg.DATASET
    rp = d.radar_params() if hasattr(d, "radar_params") else None
    if rp is None:
        from hupr_tpu.ops.dsp import RadarParams
        rp = RadarParams()
    frame_samples = rp.num_rx * rp.num_chirp * rp.num_adc_samples * 2

    model = build_model(cfg)
    example = (1, d.numGroupFrames, d.numFrames, 2,
               d.rangeSize, d.azimuthSize, d.elevationSize)
    if args.checkpoint:
        from hupr_tpu.engine.checkpoint import load_checkpoint
        from hupr_tpu.engine.steps import init_state
        state = init_state(model, cfg, jax.random.PRNGKey(0))
        state, *_ = load_checkpoint(args.checkpoint, state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
    else:
        print("live_serve: SYNTHETIC weights (no --checkpoint)")
        variables = synthetic_variables(model, example)

    est = StreamingPoseEstimator(model, variables, params=rp,
                                 group=d.numGroupFrames,
                                 num_frames=d.numFrames)

    # compile BEFORE any packet arrives: the first process_frame call takes
    # seconds-to-minutes (cold cache) while the capture keeps streaming —
    # without this warmup a replay overruns the ring during the compile and
    # frames() dies on an empty stream instead of serving
    print("live_serve: warming up (compiling first_step + step)...",
          flush=True)
    zero = (np.zeros((rp.num_rx, rp.num_chirp, rp.num_adc_samples),
                     np.int16),) * 2
    for _ in range(2):
        est.process_frame(zero, zero)
    est.reset()

    replaying = bool(args.synthetic or args.replay)
    # a replay pushes all frames immediately; size the ring to hold them
    ring = max(args.ring_frames, args.frames + 2) if replaying \
        else args.ring_frames
    with UDPCaptureSource(frame_samples, port=args.hori_port,
                          host="127.0.0.1" if replaying else "0.0.0.0",
                          ring_frames=ring) as hori_src, \
         UDPCaptureSource(frame_samples, port=args.vert_port,
                          host="127.0.0.1" if replaying else "0.0.0.0",
                          ring_frames=ring) as vert_src:

        if args.synthetic or args.replay:
            if args.replay:
                load = lambda view: np.fromfile(
                    os.path.join(args.replay, view, "adc_data.bin"),
                    np.int16, count=args.frames * frame_samples)
                streams = {v: load(v) for v in ("hori", "vert")}
            else:
                rng = np.random.default_rng(0)
                streams = {v: rng.integers(
                    -300, 300, args.frames * frame_samples).astype(np.int16)
                    for v in ("hori", "vert")}
            replay_thread(streams["hori"], hori_src.port, DEFAULT_PAYLOAD, 10)
            replay_thread(streams["vert"], vert_src.port, DEFAULT_PAYLOAD, 10)

        print(f"listening: hori={hori_src.port} vert={vert_src.port}, "
              f"{frame_samples} int16/frame, serving {args.frames} frames")
        t0 = time.perf_counter()
        n = 0
        # pair the two views by ABSOLUTE stream frame index, not arrival
        # order: an asymmetric drop (ring overflow on one port) would
        # otherwise silently shift every subsequent pose by a frame
        hori_it = hori_src.frames_indexed(2 * args.frames, timeout=30.0)
        vert_it = vert_src.frames_indexed(2 * args.frames, timeout=30.0)
        try:
            while n < args.frames:
                hidx, hf = next(hori_it)
                vidx, vf = next(vert_it)
                while hidx != vidx:
                    print(f"resync: hori@{hidx} vert@{vidx} — skipping the "
                          "older view frame")
                    if hidx < vidx:
                        hidx, hf = next(hori_it)
                    else:
                        vidx, vf = next(vert_it)
                pred, maxv = est.process_frame(stream_to_iq_planes(hf, rp),
                                               stream_to_iq_planes(vf, rp))
                n += 1
                if n in (1, args.frames) or n % 16 == 0:
                    print(f"frame {n:4d} (stream idx {hidx}): "
                          f"keypoint[0]={np.asarray(pred)[0]}, "
                          f"max={float(np.asarray(maxv).max()):.4f}")
        except (StopIteration, TimeoutError) as exc:
            print(f"capture ended early after {n} aligned frames: "
                  f"{type(exc).__name__} {exc}")
        list(est.flush())   # drain the end-of-sequence lookahead poses
        dt = time.perf_counter() - t0
        print(f"served {n} frames in {dt:.2f}s = {n / dt:.1f} fps "
              f"(includes capture wait + device round-trips)")
        print(f"hori stats: {hori_src.reassembler.stats()}")
        print(f"vert stats: {vert_src.reassembler.stats()}")


if __name__ == "__main__":
    main()
