// Host-side KV store for the cold embedding tiers — native component.
//
// TPU-native counterpart of the reference's DRAM/SSD embedding tiers:
//   * LocklessHashMap DRAM store (cpu_hash_map_kv.h:25)  -> open-addressing
//     index + slab arena in host memory;
//   * SSDHashKV (ssd_hash_kv.h:139): append-only emb-file value log with an
//     in-memory index and compaction                      -> the same design:
//     rows evicted from DRAM append to a value log; lookups fault rows back;
//     hkv_compact() rewrites live entries and truncates dead space.
//
// Single-writer / multi-reader usage from Python's data threads; a coarse
// mutex keeps it simple (the hot path on TPU never touches this store —
// only the prefetch thread and the eviction flush do).
//
// C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <string>
#include <vector>

namespace {

// Slot lifecycle: kFree -> kLive -> kTomb (erase) -> kLive (reuse) / kFree
// (rehash).  An explicit state byte instead of reserved key values: every
// int64 is a legal user key, and tombstones can be counted and reclaimed
// (the reference's lockless map reserves empty/deleted keys instead —
// cpu_hash_map_kv.h — which this design deliberately avoids).
enum SlotState : uint8_t { kFree = 0, kLive = 1, kTomb = 2 };

struct Slot {
  int64_t key = 0;
  int64_t loc = -1;     // >=0: dram row index; <0 && live: ~loc = ssd offset
  uint32_t freq = 0;
  uint8_t state = kFree;
};

struct HostKV {
  std::mutex mu;
  int64_t row_bytes = 0;
  // index
  std::vector<Slot> slots;
  int64_t count = 0;          // live keys
  int64_t tombstones = 0;     // erased-but-unreclaimed slots
  // dram arena
  std::vector<uint8_t> arena;
  std::vector<int64_t> arena_owner;   // slot index per dram row (for eviction)
  int64_t dram_rows = 0;
  int64_t max_dram_rows = -1;         // <0: unbounded (pure DRAM mode)
  int64_t clock_hand = 0;
  // ssd value log
  FILE* log = nullptr;
  std::string log_path;
  int64_t log_tail = 0;       // append offset
  int64_t log_live = 0;       // live bytes (for compaction trigger)
  int64_t io_errors = 0;      // failed log writes/reads (round-5 review)

  int64_t cap() const { return static_cast<int64_t>(slots.size()); }
};

uint64_t mix64(uint64_t x) {
  x ^= x >> 30; x *= 0xBF58476D1CE4E5B9ull;
  x ^= x >> 27; x *= 0x94D049BB133111EBull;
  x ^= x >> 31;
  return x;
}

// Triangular probing over power-of-two capacity.  Sets *found and returns
// the key's slot if live, else the insertion slot: the first tombstone on
// the probe chain (reclaiming it), or the terminating free slot.
// Terminates because occupancy (live + tombstones) is kept below cap/2.
int64_t probe(const HostKV& kv, int64_t key, bool* found) {
  int64_t mask = kv.cap() - 1;
  int64_t h = static_cast<int64_t>(mix64(static_cast<uint64_t>(key))) & mask;
  int64_t first_tomb = -1;
  for (int64_t r = 0;; ++r) {
    int64_t s = (h + r * (r + 1) / 2) & mask;
    const Slot& sl = kv.slots[s];
    if (sl.state == kLive && sl.key == key) { *found = true; return s; }
    if (sl.state == kTomb && first_tomb < 0) first_tomb = s;
    if (sl.state == kFree) {
      *found = false;
      return first_tomb >= 0 ? first_tomb : s;
    }
  }
}

void grow_index(HostKV& kv) {
  std::vector<Slot> old = std::move(kv.slots);
  kv.slots.assign(old.size() * 2, Slot{});
  kv.tombstones = 0;  // rehash drops every tombstone
  for (const Slot& s : old) {
    if (s.state != kLive) continue;
    bool found;
    int64_t d = probe(kv, s.key, &found);
    kv.slots[d] = s;
    if (s.loc >= 0) kv.arena_owner[s.loc] = d;
  }
}

// Grow (purging tombstones) whenever live+tomb occupancy would reach the
// 0.5 load threshold — bounds probe chains AND reclaims erased slots, so
// the promote-erase/demote-reinsert cycle of tiered training cannot
// exhaust free slots.
void maybe_grow(HostKV& kv) {
  if ((kv.count + kv.tombstones + 1) * 2 >= kv.cap()) grow_index(kv);
}

int64_t dram_alloc(HostKV& kv) {
  int64_t row = kv.dram_rows++;
  if ((row + 1) * kv.row_bytes > static_cast<int64_t>(kv.arena.size())) {
    kv.arena.resize((kv.arena.size() + kv.row_bytes) * 2);
    kv.arena_owner.resize(kv.arena.size() / kv.row_bytes + 1, -1);
  }
  if (static_cast<int64_t>(kv.arena_owner.size()) <= row)
    kv.arena_owner.resize(row + 1, -1);
  return row;
}

// Returns false (and leaves kv state untouched) on a failed write — the
// caller must then keep the row where it was.  Unchecked fwrite used to
// let a disk-full eviction point a live slot at bytes that never landed
// (round-5 review).
bool log_append(HostKV& kv, const uint8_t* row, int64_t* off_out) {
  if (fseeko(kv.log, kv.log_tail, SEEK_SET) != 0) {
    kv.io_errors++;
    return false;
  }
  size_t n = fwrite(row, 1, static_cast<size_t>(kv.row_bytes), kv.log);
  if (n != static_cast<size_t>(kv.row_bytes)) {
    kv.io_errors++;
    return false;
  }
  *off_out = kv.log_tail;
  kv.log_tail += kv.row_bytes;
  kv.log_live += kv.row_bytes;
  return true;
}

void log_read(HostKV& kv, int64_t off, uint8_t* out) {
  fseeko(kv.log, off, SEEK_SET);
  size_t n = fread(out, 1, static_cast<size_t>(kv.row_bytes), kv.log);
  if (n != static_cast<size_t>(kv.row_bytes)) {
    kv.io_errors++;  // surfaced via hkv_io_errors — not a silent zero row
    memset(out, 0, kv.row_bytes);
  }
}

// Evict one DRAM row to the SSD log using CLOCK second-chance on freq.
void evict_one(HostKV& kv) {
  if (kv.log == nullptr || kv.dram_rows == 0) return;
  for (int spins = 0; spins < kv.dram_rows * 2 + 2; ++spins) {
    kv.clock_hand = (kv.clock_hand + 1) % kv.dram_rows;
    int64_t sidx = kv.arena_owner[kv.clock_hand];
    if (sidx < 0) continue;
    Slot& s = kv.slots[sidx];
    if (s.freq > 0) { s.freq >>= 1; continue; }   // second chance
    // move row clock_hand to ssd; on a failed write the row simply STAYS
    // in DRAM (graceful degradation past max_dram_rows beats serving
    // zeroed embeddings)
    int64_t off;
    if (!log_append(kv, kv.arena.data() + kv.clock_hand * kv.row_bytes,
                    &off))
      return;
    s.loc = ~off;
    // compact arena: move last dram row into the hole
    int64_t last = kv.dram_rows - 1;
    if (kv.clock_hand != last) {
      memcpy(kv.arena.data() + kv.clock_hand * kv.row_bytes,
             kv.arena.data() + last * kv.row_bytes, kv.row_bytes);
      int64_t moved_slot = kv.arena_owner[last];
      kv.arena_owner[kv.clock_hand] = moved_slot;
      if (moved_slot >= 0) kv.slots[moved_slot].loc = kv.clock_hand;
    }
    kv.arena_owner[last] = -1;
    kv.dram_rows--;
    return;
  }
}

}  // namespace

extern "C" {

void* hkv_create(int64_t row_bytes, int64_t capacity_hint) {
  auto* kv = new HostKV();
  kv->row_bytes = row_bytes;
  int64_t cap = 1024;
  while (cap < capacity_hint * 2) cap <<= 1;
  kv->slots.assign(cap, Slot{});
  kv->arena.reserve(row_bytes * 1024);
  return kv;
}

void hkv_destroy(void* h) {
  auto* kv = static_cast<HostKV*>(h);
  if (kv->log) fclose(kv->log);
  delete kv;
}

// Enable the SSD tier: rows beyond max_dram_rows spill to an append-log.
// Refuses a second call: re-opening with "w+b" would truncate the log
// while live slots still hold offsets into it (every SSD-resident row
// would then read back zeroed) and leak the old FILE* (round-5 review).
int32_t hkv_enable_ssd(void* h, const char* path, int64_t max_dram_rows) {
  auto* kv = static_cast<HostKV*>(h);
  std::lock_guard<std::mutex> l(kv->mu);
  if (kv->log) return -2;  // already enabled
  kv->log = fopen(path, "w+b");
  if (!kv->log) return -1;
  kv->log_path = path;
  kv->max_dram_rows = max_dram_rows;
  return 0;
}

void hkv_upsert(void* h, int64_t n, const int64_t* keys, const uint8_t* rows,
                const uint32_t* freqs) {
  auto* kv = static_cast<HostKV*>(h);
  std::lock_guard<std::mutex> l(kv->mu);
  for (int64_t i = 0; i < n; ++i) {
    maybe_grow(*kv);
    bool found;
    int64_t s = probe(*kv, keys[i], &found);
    Slot& slot = kv->slots[s];
    if (!found) {
      if (slot.state == kTomb) kv->tombstones--;
      slot.state = kLive;
      slot.key = keys[i];
      slot.freq = 0;
      slot.loc = dram_alloc(*kv);
      kv->arena_owner[slot.loc] = s;
      kv->count++;
    } else if (slot.loc < 0) {
      // resident on ssd: old log entry becomes dead, rewrite into dram
      kv->log_live -= kv->row_bytes;
      slot.loc = dram_alloc(*kv);
      kv->arena_owner[slot.loc] = s;
    }
    memcpy(kv->arena.data() + slot.loc * kv->row_bytes,
           rows + i * kv->row_bytes, kv->row_bytes);
    slot.freq = freqs ? freqs[i] : slot.freq + 1;
    if (kv->max_dram_rows >= 0) {
      while (kv->dram_rows > kv->max_dram_rows) evict_one(*kv);
    }
  }
}

// Lookup n keys; found rows copied to out (i-th row slot), found[i]=1.
// erase=1 removes found keys (the "promote to device" move semantics).
int64_t hkv_lookup(void* h, int64_t n, const int64_t* keys, uint8_t* out,
                   uint32_t* out_freqs, uint8_t* found, int32_t erase) {
  auto* kv = static_cast<HostKV*>(h);
  std::lock_guard<std::mutex> l(kv->mu);
  int64_t hits = 0;
  for (int64_t i = 0; i < n; ++i) {
    bool hit;
    int64_t s = probe(*kv, keys[i], &hit);
    if (!hit) { found[i] = 0; continue; }
    Slot& slot = kv->slots[s];
    found[i] = 1;
    ++hits;
    if (slot.loc >= 0) {
      memcpy(out + i * kv->row_bytes,
             kv->arena.data() + slot.loc * kv->row_bytes, kv->row_bytes);
    } else {
      log_read(*kv, ~slot.loc, out + i * kv->row_bytes);
    }
    if (out_freqs) out_freqs[i] = slot.freq;
    if (erase) {
      // NOTE: open addressing deletion via backward-shift is unsafe with
      // triangular probing; mark dead by key tombstone rewrite on next grow.
      if (slot.loc >= 0) {
        int64_t last = kv->dram_rows - 1;
        if (slot.loc != last) {
          memcpy(kv->arena.data() + slot.loc * kv->row_bytes,
                 kv->arena.data() + last * kv->row_bytes, kv->row_bytes);
          int64_t moved = kv->arena_owner[last];
          kv->arena_owner[slot.loc] = moved;
          if (moved >= 0) kv->slots[moved].loc = slot.loc;
        }
        kv->arena_owner[last] = -1;
        kv->dram_rows--;
      } else {
        kv->log_live -= kv->row_bytes;
      }
      slot.loc = -1;
      slot.state = kTomb;  // keeps probe chains intact until the next rehash
      slot.freq = 0;
      kv->count--;
      kv->tombstones++;
    } else {
      slot.freq++;
    }
  }
  return hits;
}

int64_t hkv_size(void* h) {
  auto* kv = static_cast<HostKV*>(h);
  std::lock_guard<std::mutex> l(kv->mu);
  return kv->count;
}

int64_t hkv_dram_rows(void* h) {
  auto* kv = static_cast<HostKV*>(h);
  std::lock_guard<std::mutex> l(kv->mu);
  return kv->dram_rows;
}

int64_t hkv_log_bytes(void* h) {
  auto* kv = static_cast<HostKV*>(h);
  std::lock_guard<std::mutex> l(kv->mu);
  return kv->log_tail;
}

// Export every live entry (for checkpointing): fills keys/rows/freqs up to
// max_n; returns count written.
int64_t hkv_export(void* h, int64_t max_n, int64_t* keys, uint8_t* rows,
                   uint32_t* freqs) {
  auto* kv = static_cast<HostKV*>(h);
  std::lock_guard<std::mutex> l(kv->mu);
  int64_t n = 0;
  for (const Slot& s : kv->slots) {
    if (s.state != kLive) continue;
    if (n >= max_n) break;
    keys[n] = s.key;
    if (s.loc >= 0) {
      memcpy(rows + n * kv->row_bytes,
             kv->arena.data() + s.loc * kv->row_bytes, kv->row_bytes);
    } else {
      log_read(*kv, ~s.loc, rows + n * kv->row_bytes);
    }
    if (freqs) freqs[n] = s.freq;
    ++n;
  }
  return n;
}

// Rewrite the SSD log keeping only live entries (SSDHashKV async compaction,
// TF_SSDHASH_ASYNC_COMPACTION); returns reclaimed bytes.
int64_t hkv_compact(void* h) {
  auto* kv = static_cast<HostKV*>(h);
  std::lock_guard<std::mutex> l(kv->mu);
  if (!kv->log) return 0;
  std::string tmp = kv->log_path + ".compact";
  FILE* nf = fopen(tmp.c_str(), "w+b");
  if (!nf) {
    kv->io_errors++;
    return 0;
  }
  // TRANSACTIONAL copy (round-5 review): write everything to the new log
  // and verify BEFORE touching any slot offset or the old file — a
  // disk-full mid-compact used to rewrite slot.loc into a truncated file
  // and delete the old log, silently zeroing every SSD-resident row.
  int64_t off = 0;
  std::vector<uint8_t> row(kv->row_bytes);
  std::vector<std::pair<Slot*, int64_t>> moves;
  bool ok = true;
  for (Slot& s : kv->slots) {
    if (s.state != kLive || s.loc >= 0) continue;
    log_read(*kv, ~s.loc, row.data());
    if (fseeko(nf, off, SEEK_SET) != 0 ||
        fwrite(row.data(), 1, static_cast<size_t>(kv->row_bytes), nf) !=
            static_cast<size_t>(kv->row_bytes)) {
      ok = false;
      break;
    }
    moves.emplace_back(&s, ~off);
    off += kv->row_bytes;
  }
  if (ok && fflush(nf) != 0) ok = false;
  if (!ok) {
    kv->io_errors++;
    fclose(nf);
    remove(tmp.c_str());
    return 0;  // old log + offsets intact
  }
  // commit: install new offsets, then swap files
  for (auto& m : moves) m.first->loc = m.second;
  int64_t reclaimed = kv->log_tail - off;
  fclose(kv->log);
  remove(kv->log_path.c_str());
  if (rename(tmp.c_str(), kv->log_path.c_str()) != 0) kv->io_errors++;
  kv->log = nf;
  kv->log_tail = off;
  kv->log_live = off;
  return reclaimed;
}

// Cumulative failed log reads/writes — host-side observability for the
// SSD tier (0 on a healthy store; a growing count means disk trouble and
// possibly zero-filled cold reads).
int64_t hkv_io_errors(void* h) {
  auto* kv = static_cast<HostKV*>(h);
  std::lock_guard<std::mutex> l(kv->mu);
  return kv->io_errors;
}

}  // extern "C"
