// Oracle dumper for the procedural-image byte-identity tests.
//
// Compiled by tests/test_procedural.py against a patched copy of the
// REFERENCE's yocto_math.h (patch: scripts/measure_reference.py
// patch_yocto_math — constexpr relaxation only, no behavior change) and
// run to dump each ym:: procedural maker's raw RGBA bytes in row-major
// (height, width, 4) order. procedural.py must match byte-for-byte.
//
// Usage: dump_procedural_ref <outdir>

#include <cstdio>
#include <string>

#include "yocto_math.h"

template <typename T>
static void dump(const std::string& path, const ym::image<T>& img) {
    FILE* f = fopen(path.c_str(), "wb");
    for (int j = 0; j < img.height(); j++) {
        for (int i = 0; i < img.width(); i++) {
            auto p = img.at(i, j);
            fwrite(&p, sizeof(p), 1, f);
        }
    }
    fclose(f);
}

int main(int argc, char** argv) {
    if (argc < 2) return 1;
    std::string out = argv[1];
    int w = 128, h = 128, tile = 32;
    dump(out + "/grid.bin", ym::make_grid_image(w, h, tile));
    dump(out + "/checker.bin", ym::make_checker_image(w, h, tile));
    dump(out + "/bumpdimple.bin", ym::make_bumpdimple_image(w, h, tile));
    dump(out + "/ramp.bin",
         ym::make_ramp_image(w, h, {10, 20, 30, 255}, {200, 100, 50, 255}));
    dump(out + "/ramp_srgb.bin",
         ym::make_ramp_image(w, h, {10, 20, 30, 255}, {200, 100, 50, 255},
                             true));
    dump(out + "/gammaramp.bin", ym::make_gammaramp_image(w, h));
    dump(out + "/uv.bin", ym::make_uv_image(w, h));
    dump(out + "/uvgrid.bin", ym::make_uvgrid_image(w, h, tile, true));
    dump(out + "/uvgrid_gray.bin", ym::make_uvgrid_image(w, h, tile, false));
    dump(out + "/recuvgrid.bin", ym::make_recuvgrid_image(w, h, tile, true));
    dump(out + "/bump_normal.bin",
         ym::bump_to_normal_map(ym::make_bumpdimple_image(w, h, tile), 4.0f));
    return 0;
}
