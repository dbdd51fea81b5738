// stub reimplementation of the brotli command helpers used by the
// reference decoder path (RFC 7932 section 5 tables)
#pragma once
#include <stdint.h>
#include "../common/constants.h"
#include "fast_log.h"

typedef struct Command {
  uint32_t insert_len_;
  uint32_t copy_len_;
  uint32_t dist_extra_;
  uint16_t cmd_prefix_;
  uint16_t dist_prefix_;
} Command;

static const uint32_t kBrotligStubInsBase[24] = {
    0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50, 66, 98,
    130, 194, 322, 578, 1090, 2114, 6210, 22594};
static const uint32_t kBrotligStubInsExtra[24] = {
    0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10, 12,
    14, 24};
static const uint32_t kBrotligStubCpyBase[24] = {
    2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22, 30, 38, 54, 70, 102,
    134, 198, 326, 582, 1094, 2118};
static const uint32_t kBrotligStubCpyExtra[24] = {
    0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9,
    10, 24};

static inline uint32_t GetInsertBase(uint16_t c) {
  return kBrotligStubInsBase[c];
}
static inline uint32_t GetInsertExtra(uint16_t c) {
  return kBrotligStubInsExtra[c];
}
static inline uint32_t GetCopyBase(uint16_t c) {
  return kBrotligStubCpyBase[c];
}
static inline uint32_t GetCopyExtra(uint16_t c) {
  return kBrotligStubCpyExtra[c];
}
static inline uint16_t GetInsertLengthCode(size_t n) {
  if (n < 6) return (uint16_t)n;
  if (n < 130) {
    uint32_t nbits = Log2FloorNonZero(n - 2) - 1u;
    return (uint16_t)((nbits << 1) + ((n - 2) >> nbits) + 2);
  }
  if (n < 2114) return (uint16_t)(Log2FloorNonZero(n - 66) + 10);
  if (n < 6210) return 21;
  if (n < 22594) return 22;
  return 23;
}
static inline uint16_t GetCopyLengthCode(size_t n) {
  if (n < 10) return (uint16_t)(n - 2);
  if (n < 134) {
    uint32_t nbits = Log2FloorNonZero(n - 6) - 1u;
    return (uint16_t)((nbits << 1) + ((n - 6) >> nbits) + 4);
  }
  if (n < 2118) return (uint16_t)(Log2FloorNonZero(n - 70) + 12);
  return 23;
}
static inline uint32_t CommandCopyLen(const Command* c) {
  return c->copy_len_ & 0x1FFFFFF;
}
static inline uint32_t CommandCopyLenCode(const Command* c) {
  uint32_t modifier = c->copy_len_ >> 25;
  int32_t delta = (int8_t)((uint8_t)(modifier | ((modifier & 0x40) << 1)));
  return (uint32_t)((int32_t)(c->copy_len_ & 0x1FFFFFF) + delta);
}
