// Probe the reference's clean_or_clip_poly: stdin lines of
// "ring x1 y1 x2 y2 ..." (one polygon, multiple rings until blank/EOF),
// prints the cleaned drawvec. Semantics only - test oracle.
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>
#include <sstream>
#include <iostream>
#include "geometry.hpp"

int prevent[256];
int additional[256];
int geometry_scale = 0;
// minimal stubs for geometry.o's decode path (never called here)
void deserialize_byte(const char **f, signed char *n) { *n = **f; *f += 1; }
void deserialize_long_long(const char **f, long long *n) { *n = 0; (void) f; }
int nodecmp(const void *a, const void *b) { (void) a; (void) b; return 0; }

extern drawvec clean_or_clip_poly(drawvec &geom, int z, int buffer, bool clip, bool try_scaling);

int main(int argc, char **argv) {
    bool scale_up = argc > 1 && std::string(argv[1]) == "scale";
    std::string line;
    drawvec geom;
    while (std::getline(std::cin, line)) {
        if (line.empty()) continue;
        if (line == "END") {
            drawvec out = clean_or_clip_poly(geom, 0, 0, false, scale_up);
            printf("RESULT %zu\n", out.size());
            for (auto &d : out) printf("%d %lld %lld\n", d.op, (long long) d.x, (long long) d.y);
            printf("DONE\n");
            fflush(stdout);
            geom.clear();
            continue;
        }
        std::istringstream ss(line);
        std::string tag; ss >> tag;
        long long x, y; bool first = true;
        while (ss >> x >> y) {
            geom.emplace_back(first ? VT_MOVETO : VT_LINETO, x, y);
            first = false;
        }
    }
    return 0;
}
