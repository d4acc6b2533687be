// Instrumented probe for the reference's vendored milo dtoa (Grisu2):
// reads one hex-encoded IEEE-754 bit pattern per stdin line, prints
// milo::dtoa_milo(value) per line. Built by the test ritual:
//   g++ -O2 -I /root/reference -o /tmp/dtoa_probe tools/dtoa_probe.cpp
// tests/test_kernels.py::test_dtoa_milo_vs_probe diffs our from-scratch
// functions/text.py dtoa_milo against it bit-for-bit.
#include <cstdint>
#include <cstring>
#include <iostream>
#include <string>

#include "milo/dtoa_milo.h"

int main() {
    std::string line;
    while (std::getline(std::cin, line)) {
        if (line.empty()) continue;
        uint64_t bits = strtoull(line.c_str(), nullptr, 16);
        double v;
        memcpy(&v, &bits, sizeof v);
        std::cout << milo::dtoa_milo(v) << "\n";
    }
    return 0;
}
