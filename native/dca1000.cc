// hupr_tpu native DCA1000 live-capture frontend.
//
// Role: the reference consumes DCA1000 captures only as post-hoc
// adc_data.bin files (reference preprocessing/process_iwr1843.py:91-104
// reads the whole file); there is no live path. This component turns the
// capture card's raw-mode UDP packet stream into whole radar frames for
// the streaming serving pipeline (hupr_tpu/engine/streaming.py), handling
// the realities of UDP: reordering, duplication, drops, and bursts.
//
// DCA1000EVM raw-mode data packet (TI spec, little-endian):
//   bytes 0-3   uint32  sequence number (1-based packet counter)
//   bytes 4-9   uint48  byte count = offset of this payload in the stream
//   bytes 10-.. payload (raw int16 ADC samples, typ. <= 1456 bytes)
//
// Reassembly contract (mirrors TI's own parsing scripts): payloads are
// placed at their byte offset; spans never received by the time a frame
// is consumed read as ZEROS ("zero-fill"), so one lost packet corrupts
// one frame span instead of shifting every later sample. A bounded ring
// holds `ring_frames` frames; if the producer outruns the consumer the
// OLDEST unread frames are discarded (drop-oldest: live streaming wants
// the freshest data, and the consumer can see it happened via stats).
//
// Thread contract: one feeder thread + one reader thread is the intended
// topology; a mutex keeps feed/read/stats atomic (packet payloads are
// ~1.5 KB — copy time under the lock is trivial next to the syscall that
// produced them).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -o libhupr_dca1000.so dca1000.cc

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <vector>

namespace {

struct Capture {
  std::mutex mu;
  long frame_bytes = 0;
  long capacity = 0;        // ring bytes = ring_frames * frame_bytes
  std::vector<uint8_t> ring;  // zero-initialized; consumed spans re-zeroed
  long base = 0;            // stream offset of the oldest unread frame
  long watermark = 0;       // highest stream offset written (exclusive)
  // far-ahead offset confirmation (see hupr_cap_feed): first sighting of a
  // jump beyond one ring past the watermark, awaiting a second agreeing
  // packet before the (bounded) resync is allowed to move base
  long resync_candidate = -1;
  // stats
  long packets = 0;
  long bytes = 0;           // payload bytes accepted into the ring
  long late_bytes = 0;      // payload below base on arrival (too old)
  long overflow_frames = 0; // unread frames discarded to make room
  long reordered = 0;       // packets whose seq went backwards
  long rejected = 0;        // unconfirmed far offsets dropped
  long resyncs = 0;         // confirmed jumps (base snapped ahead/behind)
  uint32_t last_seq = 0;
};

inline uint8_t* slot(Capture* c, long stream_off) {
  return c->ring.data() + (stream_off % c->capacity);
}

// Zero + discard the oldest unread frame (ring overflow / consumption).
void drop_oldest(Capture* c) {
  long off = c->base;
  for (long i = 0; i < c->frame_bytes; i++) *slot(c, off + i) = 0;
  c->base += c->frame_bytes;
  if (c->watermark < c->base) c->watermark = c->base;
}

// Two-packet confirmation for a far offset (ahead OR behind): the first
// sighting is remembered + rejected; a second DISTINCT offset agreeing
// with it (strictly ahead of the candidate, within one ring span) performs
// the bounded resync — zero the ring, snap base to the new region's frame
// boundary. Returns true when the resync happened (caller may then place
// the payload normally).
bool try_resync(Capture* c, long off) {
  if (c->resync_candidate >= 0 && off > c->resync_candidate &&
      off <= c->resync_candidate + c->capacity) {
    c->overflow_frames += (c->watermark - c->base) / c->frame_bytes;
    std::fill(c->ring.begin(), c->ring.end(), 0);
    c->base = (off / c->frame_bytes) * c->frame_bytes;
    c->watermark = c->base;
    c->resync_candidate = -1;
    c->resyncs++;
    return true;
  }
  c->resync_candidate = off;
  c->rejected++;
  return false;
}

}  // namespace

extern "C" {

void* hupr_cap_create(long frame_bytes, long ring_frames) {
  if (frame_bytes <= 0 || ring_frames <= 0) return nullptr;
  Capture* c = new Capture();
  c->frame_bytes = frame_bytes;
  c->capacity = frame_bytes * ring_frames;
  c->ring.assign(c->capacity, 0);
  return c;
}

void hupr_cap_destroy(void* h) { delete static_cast<Capture*>(h); }

// Feed one raw-mode UDP datagram (header + payload). Returns the payload
// bytes accepted, 0 if the packet was entirely too old, -1 on a malformed
// packet (shorter than the 10-byte header).
long hupr_cap_feed(void* h, const uint8_t* pkt, long len) {
  Capture* c = static_cast<Capture*>(h);
  if (len < 10) return -1;
  uint32_t seq;
  memcpy(&seq, pkt, 4);
  uint64_t off64 = 0;
  memcpy(&off64, pkt + 4, 6);  // little-endian uint48
  long off = (long)off64;
  const uint8_t* payload = pkt + 10;
  long n = len - 10;

  std::lock_guard<std::mutex> lock(c->mu);
  c->packets++;
  if (c->last_seq != 0 && seq <= c->last_seq) c->reordered++;
  if (seq > c->last_seq) c->last_seq = seq;

  if (off + n <= c->base) {  // entirely below the oldest unread frame
    // A DCA1000 restart resets the stream's byte counter to 0, so every
    // post-restart packet lands far BELOW base and would read as late
    // forever — a permanently dead stream. A far-behind offset (more than
    // one ring below base) therefore gets the same two-packet confirmation
    // as far-ahead, then snaps base BACKWARDS to the restarted stream.
    // Near-behind packets (within one ring) stay plain late/duplicates.
    if (off + c->capacity < c->base && try_resync(c, off)) {
      // resynced: fall through to the normal placement path
    } else {
      c->late_bytes += n;
      return 0;
    }
  }
  if (off < c->base) {  // straddles base: accept only the live tail
    long skip = c->base - off;
    c->late_bytes += skip;
    payload += skip;
    off += skip;
    n -= skip;
  }
  // An offset beyond one full ring past the newest byte written is either
  // a corrupted header or a genuine forward jump (reader stalled long
  // enough for the kernel to drop more than a ring of stream). A single
  // corrupted packet must not wipe the ring or spin the drop loop for
  // minutes under the lock (off ~ 2^40 did exactly that), so far offsets
  // need CONFIRMATION: the first is dropped but remembered; a second
  // packet agreeing with it (STRICTLY ahead, within one ring span)
  // triggers a bounded resync — zero the ring, snap base to the new
  // region's frame boundary. Strictly ahead matters: UDP duplication of
  // the one corrupted datagram replays the identical offset, which must
  // not count as independent agreement (it would confirm a bogus resync
  // to ~2^40 and every genuine packet after it would read as late —
  // a permanently dead stream). Random corruption never produces two
  // DISTINCT agreeing far offsets; a real jump confirms on the very next
  // datagram, whose offset is greater by one payload.
  if (off > c->watermark + c->capacity) {
    if (!try_resync(c, off)) return 0;
  } else {
    c->resync_candidate = -1;  // normal traffic clears a stale candidate
  }
  // make room: discard oldest unread frames until the payload fits. With
  // off <= watermark + capacity this runs at most ring_frames + 1 times.
  while (off + n > c->base + c->capacity) {
    drop_oldest(c);
    c->overflow_frames++;
  }
  // place the payload (may wrap the ring boundary)
  for (long i = 0; i < n; i++) *slot(c, off + i) = payload[i];
  c->bytes += n;
  if (off + n > c->watermark) c->watermark = off + n;
  return n;
}

long hupr_cap_frames_ready(void* h) {
  Capture* c = static_cast<Capture*>(h);
  std::lock_guard<std::mutex> lock(c->mu);
  return (c->watermark - c->base) / c->frame_bytes;
}

// Pop the oldest frame into `out` (frame_bytes bytes) and its absolute
// stream index (byte offset / frame_bytes) into `frame_idx` — the index is
// what lets a consumer ALIGN two independent capture streams (hori/vert)
// after asymmetric drops. Spans never received read as zeros. Returns 1 on
// success, 0 when no complete frame is buffered.
int hupr_cap_read_frame(void* h, uint8_t* out, long* frame_idx) {
  Capture* c = static_cast<Capture*>(h);
  std::lock_guard<std::mutex> lock(c->mu);
  if (c->watermark - c->base < c->frame_bytes) return 0;
  for (long i = 0; i < c->frame_bytes; i++) out[i] = *slot(c, c->base + i);
  if (frame_idx) *frame_idx = c->base / c->frame_bytes;
  drop_oldest(c);
  return 1;
}

void hupr_cap_stats(void* h, long* packets, long* bytes, long* late_bytes,
                    long* overflow_frames, long* reordered, long* rejected,
                    long* resyncs) {
  Capture* c = static_cast<Capture*>(h);
  std::lock_guard<std::mutex> lock(c->mu);
  *packets = c->packets;
  *bytes = c->bytes;
  *late_bytes = c->late_bytes;
  *overflow_frames = c->overflow_frames;
  *reordered = c->reordered;
  *rejected = c->rejected;
  *resyncs = c->resyncs;
}

}  // extern "C"
