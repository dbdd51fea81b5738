#pragma once
#include <stdint.h>
typedef const uint8_t* ContextLut;
typedef enum { CONTEXT_LSB6 = 0, CONTEXT_MSB6 = 1, CONTEXT_UTF8 = 2,
               CONTEXT_SIGNED = 3 } ContextType;
