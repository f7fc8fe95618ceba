from hobbyrenderer_tpu.scene.scene import Scene, Material, Light, Node, CameraDesc  # noqa: F401
from hobbyrenderer_tpu.scene.cooker import CookedMesh, cook_mesh, MESHLET_MAX_VERTS, MESHLET_MAX_TRIS  # noqa: F401
from hobbyrenderer_tpu.scene.procedural import make_default_cube_scene, make_stress_scene  # noqa: F401
from hobbyrenderer_tpu.scene.camera import Camera  # noqa: F401
