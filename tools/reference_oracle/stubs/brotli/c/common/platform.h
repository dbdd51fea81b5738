#pragma once
#include "../include/brotli/types.h"
