// minimal brotli types stub (public API surface, reimplemented)
#pragma once
#include <stdint.h>
#include <stddef.h>
typedef int BROTLI_BOOL;
#define BROTLI_TRUE 1
#define BROTLI_FALSE 0
#define BROTLI_MIN(T, a, b) (((a) < (b)) ? (a) : (b))
#define BROTLI_MAX(T, a, b) (((a) > (b)) ? (a) : (b))
