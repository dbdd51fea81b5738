// stub: position of highest set bit (RFC-standard helper, reimplemented)
#pragma once
#include <stdint.h>
static inline uint32_t Log2FloorNonZero(size_t n) {
  return 31u ^ (uint32_t)__builtin_clz((uint32_t)n);
}
