"""Live DCA1000 capture reassembly (data/capture.py + native/dca1000.cc):
offset-addressed placement, zero-fill for drops, drop-oldest overflow, and
native/NumPy engine equivalence — ending at decode_dca1000 parity with a
directly-decoded stream."""

import numpy as np
import pytest

from hupr_tpu.data.capture import (DEFAULT_PAYLOAD, PacketReassembler,
                                   UDPCaptureSource, native_available,
                                   packetize)

FRAME_SAMPLES = 2048          # small synthetic geometry: 4 KiB frames
PAYLOAD = 1000                # not a divisor of frame bytes: packets straddle


def _stream(frames, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(-3000, 3000,
                        frames * FRAME_SAMPLES).astype(np.int16)


ENGINES = [False] + ([True] if native_available() else [])


@pytest.fixture(params=ENGINES, ids=lambda n: "native" if n else "numpy")
def engine(request):
    return request.param


def test_in_order_reassembly_exact(engine):
    stream = _stream(3)
    r = PacketReassembler(FRAME_SAMPLES, native=engine)
    for pkt in packetize(stream, PAYLOAD):
        assert r.feed(pkt) > 0
    got = list(r.frames())
    assert len(got) == 3
    np.testing.assert_array_equal(np.concatenate(got), stream)
    s = r.stats()
    assert s["bytes"] == stream.nbytes and s["late_bytes"] == 0
    assert s["overflow_frames"] == 0 and s["reordered"] == 0


def test_reordered_packets_exact(engine):
    stream = _stream(2, seed=1)
    pkts = packetize(stream, PAYLOAD)
    pkts[1], pkts[2] = pkts[2], pkts[1]
    r = PacketReassembler(FRAME_SAMPLES, native=engine)
    for pkt in pkts:
        r.feed(pkt)
    got = list(r.frames())
    np.testing.assert_array_equal(np.concatenate(got), stream)
    assert r.stats()["reordered"] >= 1


def test_dropped_packet_zero_fills_its_span_only(engine):
    stream = _stream(2, seed=2)
    pkts = packetize(stream, PAYLOAD)
    del pkts[1]                        # lose bytes [PAYLOAD, 2*PAYLOAD)
    r = PacketReassembler(FRAME_SAMPLES, native=engine)
    for pkt in pkts:
        r.feed(pkt)
    got = np.concatenate(list(r.frames()))
    want = stream.copy()
    lo, hi = PAYLOAD // 2, PAYLOAD      # int16 indices of the lost span
    want[lo:hi] = 0
    np.testing.assert_array_equal(got, want)


def test_duplicate_packet_harmless(engine):
    stream = _stream(1, seed=3)
    pkts = packetize(stream, PAYLOAD)
    r = PacketReassembler(FRAME_SAMPLES, native=engine)
    for pkt in pkts:
        r.feed(pkt)
        r.feed(pkt)                    # duplicate every datagram
    np.testing.assert_array_equal(np.concatenate(list(r.frames())), stream)


def test_overflow_drops_oldest_keeps_newest(engine):
    frames = 6
    stream = _stream(frames, seed=4)
    r = PacketReassembler(FRAME_SAMPLES, ring_frames=2, native=engine)
    for pkt in packetize(stream, PAYLOAD):
        r.feed(pkt)
    got = list(r.frames())
    per = FRAME_SAMPLES
    # the ring holds 2 frames: the LAST two survive, the rest were dropped
    assert len(got) == 2
    np.testing.assert_array_equal(got[0], stream[(frames - 2) * per:
                                                 (frames - 1) * per])
    np.testing.assert_array_equal(got[1], stream[(frames - 1) * per:])
    assert r.stats()["overflow_frames"] == frames - 2


def test_stale_and_malformed_packets(engine):
    stream = _stream(2, seed=5)
    pkts = packetize(stream, PAYLOAD)
    r = PacketReassembler(FRAME_SAMPLES, native=engine)
    for pkt in pkts:
        r.feed(pkt)
    assert r.read_frame() is not None   # consume frame 0: base advances
    assert r.feed(pkts[0]) == 0         # now entirely below base -> stale
    assert r.stats()["late_bytes"] == PAYLOAD
    assert r.feed(b"\x01\x02\x03") == -1


def test_corrupted_offset_rejected_stream_survives(engine):
    """A single datagram with a garbage 48-bit offset (bit-flipped header)
    must be DROPPED — not spin the drop-oldest loop for ~2^40/frame_bytes
    iterations under the lock, and not snap base so far ahead that every
    genuine packet afterwards reads as 'late' forever."""
    stream = _stream(2, seed=10)
    pkts = packetize(stream, PAYLOAD)
    r = PacketReassembler(FRAME_SAMPLES, native=engine)
    r.feed(pkts[0])
    evil = pkts[0][:4] + int(1 << 40).to_bytes(6, "little") + b"\xff" * 64
    assert r.feed(evil) == 0                  # dropped, unconfirmed
    for pkt in pkts[1:]:                      # the real stream continues
        assert r.feed(pkt) > 0
    got = list(r.frames())
    assert len(got) == 2
    np.testing.assert_array_equal(np.concatenate(got), stream)
    s = r.stats()
    assert s["rejected"] == 1 and s["resyncs"] == 0


def test_duplicated_corrupted_packet_cannot_self_confirm_resync(engine):
    """UDP duplication of the ONE corrupted datagram replays the identical
    far offset — that must not count as the confirming second sighting
    (confirmation requires a STRICTLY greater agreeing offset). Before the
    fix this wiped the ring, snapped base to ~2^40, and every genuine
    packet afterwards was discarded as late: a permanently dead stream."""
    stream = _stream(2, seed=13)
    pkts = packetize(stream, PAYLOAD)
    r = PacketReassembler(FRAME_SAMPLES, native=engine)
    r.feed(pkts[0])
    evil = pkts[0][:4] + int(1 << 40).to_bytes(6, "little") + b"\xff" * 64
    assert r.feed(evil) == 0                  # first sighting: held back
    assert r.feed(evil) == 0                  # duplicate: must NOT confirm
    for pkt in pkts[1:]:                      # the real stream continues
        assert r.feed(pkt) > 0
    got = list(r.frames())
    assert len(got) == 2
    np.testing.assert_array_equal(np.concatenate(got), stream)
    s = r.stats()
    assert s["resyncs"] == 0 and s["rejected"] == 2


def test_confirmed_forward_jump_resyncs(engine):
    """Two agreeing far-ahead offsets = a genuine stream jump (e.g. the
    kernel dropped more than a ring of packets during a stall): the ring
    resyncs to the new region and frames flow again at the right indexes."""
    frames_ahead = 1000
    jump = frames_ahead * FRAME_SAMPLES * 2   # bytes
    stream = _stream(2, seed=11)
    r = PacketReassembler(FRAME_SAMPLES, native=engine)
    pkts = packetize(stream, PAYLOAD)
    r.feed(pkts[0])                           # some pre-jump traffic
    far = []
    for pkt in pkts:                          # same payloads, offset += jump
        seq, off = pkt[:4], int.from_bytes(pkt[4:10], "little")
        far.append(seq + (off + jump).to_bytes(6, "little") + pkt[10:])
    assert r.feed(far[0]) == 0                # first sighting: held back
    for pkt in far[1:]:                       # second agrees -> resync
        assert r.feed(pkt) > 0
    idx_frames = []
    while True:
        got = r.read_frame_indexed()
        if got is None:
            break
        idx_frames.append(got)
    # frame 0 of the far region re-sends bytes [jump+0, ...) but far[0] was
    # held back for confirmation, so its span is zero-filled; frame 1 is
    # complete and must carry the post-jump absolute index
    assert [i for i, _ in idx_frames] == [frames_ahead, frames_ahead + 1]
    np.testing.assert_array_equal(idx_frames[1][1],
                                  stream[FRAME_SAMPLES:])
    s = r.stats()
    assert s["resyncs"] == 1 and s["rejected"] == 1


def test_capture_card_restart_resyncs_backwards(engine):
    """A DCA1000 restart resets the stream byte counter to 0: every packet
    then lands far BELOW base and (pre-fix) read as 'late' forever — a
    permanently dead stream until the consumer process restarted. Far-behind
    offsets get the same two-packet confirmation as far-ahead and snap base
    backwards (ADVICE r4)."""
    frames_ahead = 1000
    jump = frames_ahead * FRAME_SAMPLES * 2   # bytes
    pre = _stream(2, seed=14)
    r = PacketReassembler(FRAME_SAMPLES, native=engine)
    for pkt in packetize(pre, PAYLOAD):       # pre-restart stream, offset
        seq, off = pkt[:4], int.from_bytes(pkt[4:10], "little")
        r.feed(seq + (off + jump).to_bytes(6, "little") + pkt[10:])
    # (feeding at +jump itself took one confirmed forward resync)
    assert len(list(r.frames())) == 2         # consume; base stays ~jump
    # ...the card restarts: offsets begin again at 0
    post = _stream(2, seed=15)
    pkts = packetize(post, PAYLOAD)
    assert r.feed(pkts[0]) == 0               # first sighting: held back
    for pkt in pkts[1:]:                      # second agrees -> resync back
        assert r.feed(pkt) > 0
    got = []
    while True:
        f = r.read_frame_indexed()
        if f is None:
            break
        got.append(f)
    # indexes restart near 0; frame 0's first span is zero-filled (its
    # packet was the held-back first sighting), frame 1 is bit-exact
    assert [i for i, _ in got] == [0, 1]
    want0 = post[:FRAME_SAMPLES].copy()
    want0[:PAYLOAD // 2] = 0
    np.testing.assert_array_equal(got[0][1], want0)
    np.testing.assert_array_equal(got[1][1], post[FRAME_SAMPLES:])
    assert r.stats()["resyncs"] == 2          # one forward + the backward one


def test_read_frame_indexed_gaps_mark_drops(engine):
    """Absolute stream indexes expose overflow drops (the alignment signal
    scripts/live_serve.py pairs the hori/vert views with)."""
    stream = _stream(5, seed=12)
    r = PacketReassembler(FRAME_SAMPLES, ring_frames=2, native=engine)
    for pkt in packetize(stream, PAYLOAD):
        r.feed(pkt)
    got = []
    while True:
        f = r.read_frame_indexed()
        if f is None:
            break
        got.append(f)
    assert [i for i, _ in got] == [3, 4]      # frames 0-2 dropped (ring=2)
    np.testing.assert_array_equal(got[0][1],
                                  stream[3 * FRAME_SAMPLES:4 * FRAME_SAMPLES])


@pytest.mark.skipif(not native_available(), reason="no native toolchain")
def test_native_matches_numpy_engine_bit_for_bit():
    """Same adversarial feed order -> identical frames AND stats."""
    stream = _stream(4, seed=6)
    pkts = packetize(stream, PAYLOAD)
    order = [0, 2, 1, 1, 5, 3, 6, 4] + list(range(7, len(pkts)))
    nat = PacketReassembler(FRAME_SAMPLES, ring_frames=3, native=True)
    npy = PacketReassembler(FRAME_SAMPLES, ring_frames=3, native=False)
    assert nat.is_native and not npy.is_native
    for i in order:
        assert nat.feed(pkts[i]) == npy.feed(pkts[i])
        got_n, got_p = nat.read_frame(), npy.read_frame()
        if got_p is None:
            assert got_n is None
        else:
            np.testing.assert_array_equal(got_n, got_p)
    for fn, fp in zip(nat.frames(), npy.frames()):
        np.testing.assert_array_equal(fn, fp)
    assert nat.stats() == npy.stats()


def test_reassembled_frames_decode_like_the_capture_file():
    """End-to-end: packetized capture -> reassembler -> decode_dca1000_np
    equals decoding the pristine stream (the .bin-file path's contract)."""
    from hupr_tpu.ops.dsp import RadarParams
    from hupr_tpu.preprocessing.process_iwr1843 import decode_dca1000_np

    rx, chirps, adc = 4, 6, 64
    rp = RadarParams(num_adc_samples=adc, num_chirp=chirps)
    samples = rx * chirps * adc * 2
    rng = np.random.default_rng(7)
    stream = rng.integers(-300, 300, 2 * samples).astype(np.int16)

    r = PacketReassembler(samples)
    for pkt in packetize(stream, PAYLOAD):
        r.feed(pkt)
    frames = list(r.frames())
    assert len(frames) == 2
    for k, frame in enumerate(frames):
        want = decode_dca1000_np(stream[k * samples:(k + 1) * samples], rp)
        np.testing.assert_array_equal(decode_dca1000_np(frame, rp), want)


def test_stream_to_iq_planes_matches_decode():
    """int16 lane-split planes must equal decode_dca1000_np's complex
    output (re + j*im), just without the float cast."""
    from hupr_tpu.data.capture import stream_to_iq_planes
    from hupr_tpu.ops.dsp import RadarParams
    from hupr_tpu.preprocessing.process_iwr1843 import decode_dca1000_np

    rp = RadarParams(num_adc_samples=32, num_chirp=5)
    samples = rp.num_rx * rp.num_chirp * rp.num_adc_samples * 2
    rng = np.random.default_rng(9)
    frame = rng.integers(-300, 300, samples).astype(np.int16)
    re, im = stream_to_iq_planes(frame, rp)
    assert re.dtype == im.dtype == np.int16
    want = decode_dca1000_np(frame, rp)
    np.testing.assert_array_equal(re.astype(np.float32)
                                  + 1j * im.astype(np.float32), want)


def test_udp_capture_source_loopback():
    """Real sockets on loopback: sender thread -> UDPCaptureSource.frames."""
    stream = _stream(3, seed=8)
    pkts = packetize(stream, DEFAULT_PAYLOAD)
    with UDPCaptureSource(FRAME_SAMPLES, port=0,
                          host="127.0.0.1") as src:
        import socket
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for pkt in pkts:
            tx.sendto(pkt, ("127.0.0.1", src.port))
        got = list(src.frames(n=3, timeout=10.0))
        tx.close()
    np.testing.assert_array_equal(np.concatenate(got), stream)
