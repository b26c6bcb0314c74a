// Keccak-256 (original 0x01 padding, Ethereum-style) — native host hash.
//
// The verifier replays the whole Fiat-Shamir transcript on host
// (transcript.rs:8-210 semantics); a full-VM proof has ~10k transcript
// events and the pure-Python permutation costs ~0.8 ms each (8+ s of a
// 9 s verify, scripts/profile_verify.py).  This C implementation brings
// the whole replay to ~10 ms.  Bit-exact vs jolt_tpu/utils/keccak.py
// (tests/test_transcript.py runs both).
#include <cstdint>
#include <cstring>

static const uint64_t RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808AULL,
    0x8000000080008000ULL, 0x000000000000808BULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008AULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000AULL,
    0x000000008000808BULL, 0x800000000000008BULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800AULL, 0x800000008000000AULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

static const int ROT[5][5] = {{0, 36, 3, 41, 18},
                              {1, 44, 10, 45, 2},
                              {62, 6, 43, 15, 61},
                              {28, 55, 25, 21, 56},
                              {27, 20, 39, 8, 14}};

static inline uint64_t rol(uint64_t x, int n) {
  n &= 63;
  return n ? (x << n) | (x >> (64 - n)) : x;
}

static void keccak_f(uint64_t st[25]) {
  for (int r = 0; r < 24; r++) {
    uint64_t c[5], d[5], b[25];
    for (int x = 0; x < 5; x++)
      c[x] = st[x] ^ st[x + 5] ^ st[x + 10] ^ st[x + 15] ^ st[x + 20];
    for (int x = 0; x < 5; x++)
      d[x] = c[(x + 4) % 5] ^ rol(c[(x + 1) % 5], 1);
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++) st[x + 5 * y] ^= d[x];
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++)
        b[y + 5 * ((2 * x + 3 * y) % 5)] = rol(st[x + 5 * y], ROT[x][y]);
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++)
        st[x + 5 * y] = b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y]) &
                                        b[(x + 2) % 5 + 5 * y]);
    st[0] ^= RC[r];
  }
}

extern "C" {

// out: 32 bytes.
void jolt_keccak256(const uint8_t* data, uint64_t len, uint8_t* out) {
  const uint64_t RATE = 136;
  uint64_t st[25];
  std::memset(st, 0, sizeof(st));
  uint64_t off = 0;
  // full blocks
  while (len - off >= RATE) {
    for (int i = 0; i < 17; i++) {
      uint64_t lane;
      std::memcpy(&lane, data + off + 8 * i, 8);  // little-endian host
      st[i] ^= lane;
    }
    keccak_f(st);
    off += RATE;
  }
  // final (padded) block: 0x01 ... 0x80 (merged 0x81 when one byte left)
  uint8_t block[136];
  uint64_t rem = len - off;
  std::memset(block, 0, RATE);
  std::memcpy(block, data + off, rem);
  block[rem] ^= 0x01;
  block[RATE - 1] ^= 0x80;
  for (int i = 0; i < 17; i++) {
    uint64_t lane;
    std::memcpy(&lane, block + 8 * i, 8);
    st[i] ^= lane;
  }
  keccak_f(st);
  std::memcpy(out, st, 32);
}

// Batched chain helper for transcript replays: given a 64-byte prefix
// buffer (state || 28 zeros || n_rounds BE) the caller updates, this is
// just a loop saver; kept simple — the one-shot hash above is already
// ~1 microsecond.
}
