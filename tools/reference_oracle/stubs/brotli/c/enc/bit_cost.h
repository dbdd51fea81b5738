#pragma once
#include <stdint.h>
#include <stddef.h>
// declaration only; not referenced by the decoder objects we link
double BitsEntropy(const uint32_t* population, size_t size);
