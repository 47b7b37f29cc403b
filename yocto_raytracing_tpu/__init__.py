"""yocto_raytracing_tpu — a TPU-native differentiable Whitted raytracer.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
sebcossu/yocto_raytracing (a C++ CPU raytracer): OBJ/MTL scene loading with
Yocto camera/instance/environment extensions, two-level BVH acceleration,
stratified supersampling, point lights, Blinn-Phong + hair shading, recursive
mirror reflection, tonemapping and PNG/HDR output — rebuilt as a wavefront
megabatch renderer over SoA scene pytrees, sharded across TPU device meshes,
and differentiable w.r.t. camera, geometry and material parameters.

Layer map (mirrors SURVEY.md section 1, reimagined TPU-first):
  image             pixels, tonemap, PNG/HDR codecs           (ref: src/image.*)
  io.objparser      OBJ/MTL parser w/ yocto extensions        (ref: src/ext/yocto_obj.*)
  io.gltf           glTF 2.0/GLB I/O + animation/skin/morph   (ref: src/ext/yocto_gltf.*)
  scene             SoA pytree scene + loader                 (ref: src/scene.*, yocto_scn.*)
  bvh               flat-array two-level BVH build            (ref: src/scene.cpp:509-657)
  ops               intersectors, stream scan, traversal,
                    MC sampling, overlap queries              (ref: src/scene.cpp:229-506, ym::)
  render            camera/texture/shading/lights/renderer    (ref: src/raytrace.cpp)
  geometry          edge maps, tesselation, shape generation  (ref: yocto_math.h:3793-4480)
  animation         keyframe playback                         (ref: src/scene.cpp:35-49)
  procedural        test images, byte-equal to ym::           (ref: yocto_math.h:6482-6698)
  parallel          device-mesh sharding, multi-chip renders  (ref: none -- new capability)
  utils             CLI, config, logging, checkpointing       (ref: src/ext/yocto_utils.h)
"""

__version__ = "0.1.0"
