// Forensic probe for equal-t tie pixels (PARITY.md instance10000
// residuals). OUR code — it only LINKS the rebuilt reference library
// (/tmp/refsrc/bin/libhwlib.a) to interrogate the reference's own BVH
// and Moller-Trumbore implementations as an oracle:
//
//   tie_probe scene.obj ro.x ro.y ro.z rd.x rd.y rd.z [more ray triples]
//
// Per ray (hexfloat args accepted by strtof) prints
//   ray K bvh_pick ist=<instance index> ei=<element> t=<%a hexfloat>
// followed by the BRUTE-FORCE candidate set: every (instance, triangle)
// whose reference-intersector hit distance is within 2 ULP of the pick —
// if more than one candidate carries the bit-identical minimal t, the
// nearest hit is a tie and the winner is an implementation detail of
// traversal order, which is the claim being proven.
//
// Build (scripts/tie_forensics.py does this automatically):
//   g++ -O3 -std=c++14 -I /tmp/refsrc/src tie_probe.cpp \
//       /tmp/refsrc/bin/libhwlib.a -o /tmp/tie_probe

#include <cfloat>
#include <cmath>
#include <cstdio>
#include <cstdlib>

#include "scene.h"

// external-linkage symbols from the reference's scene.cpp (declared in no
// header; signatures per src/scene.cpp:229-263)
bool intersect_triangle(const ray3f& ray, const vec3f& v0, const vec3f& v1,
    const vec3f& v2, float& dist, vec4f& ew);

int main(int argc, char** argv) {
    if (argc < 8 || ((argc - 2) % 6) != 0) {
        fprintf(stderr, "usage: tie_probe scene.obj (ro3 rd3)+\n");
        return 2;
    }
    auto scn = load_scene(argv[1]);
    build_bvh(scn, false);

    int nrays = (argc - 2) / 6;
    for (int r = 0; r < nrays; r++) {
        vec3f ro, rd;
        for (int k = 0; k < 3; k++)
            (&ro.x)[k] = strtof(argv[2 + r * 6 + k], nullptr);
        for (int k = 0; k < 3; k++)
            (&rd.x)[k] = strtof(argv[2 + r * 6 + 3 + k], nullptr);
        auto ray = ray3f{ro, rd};  // tmin 1e-4, tmax FLT_MAX defaults
        auto isec = intersect_first(scn, ray);
        int ist_idx = -1;
        for (int i = 0; i < (int)scn->instances.size(); i++)
            if (scn->instances[i] == isec.ist) ist_idx = i;
        printf("ray %d bvh_pick ist=%d ei=%d t=%a ew=%a,%a,%a\n", r,
            ist_idx, isec.ei, isec.dist, isec.ew.x, isec.ew.y, isec.ew.z);
        if (!isec.hit()) continue;

        // ~16-ULP window above the pick: wide enough to catch the
        // ULP-crossed near-ties of coincident sheets, tight enough to
        // exclude genuinely distinct surfaces
        float lim = isec.dist * (1.0f + 2e-6f);
        for (int i = 0; i < (int)scn->instances.size(); i++) {
            auto ist = scn->instances[i];
            auto lray = transform_ray_inverse(ist->frame, ray);
            auto shp = ist->shp;
            for (int e = 0; e < (int)shp->triangles.size(); e++) {
                auto t = shp->triangles[e];
                float d;
                vec4f ew;
                if (intersect_triangle(lray, shp->pos[t.x], shp->pos[t.y],
                        shp->pos[t.z], d, ew) &&
                    d <= lim)
                    printf("  cand ist=%d ei=%d t=%a\n", i, e, d);
            }
        }
    }
    return 0;
}
