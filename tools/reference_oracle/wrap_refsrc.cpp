// Compiles the reference CPU decoder sources in place (from
// /root/reference, read-only) against our stub headers, as the
// bit-exactness oracle. MSVC-isms are bridged below: std::exception has no
// (const char*) constructor outside MSVC, and `for each ... in` is MSVC —
// neither appears on the decoder path compiled here.
#include <algorithm>
#include <atomic>
#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <exception>
#include <filesystem>
#include <fstream>
#include <iostream>
#include <iterator>
#include <map>
#include <memory>
#include <numeric>
#include <queue>
#include <set>
#include <sstream>
#include <stdexcept>
#include <string>
#include <thread>
#include <unordered_map>
#include <variant>
#include <vector>

#define exception runtime_error  // std::exception("msg") is MSVC-only

#include "/root/reference/src/common/BrotligUtils.cpp"
#include "/root/reference/src/common/BrotligDataConditioner.cpp"
#include "/root/reference/src/decoder/BrotligHuffmanTable.cpp"
#include "/root/reference/src/decoder/PageDecoder.cpp"
#include "/root/reference/src/BrotligDecoder.cpp"
