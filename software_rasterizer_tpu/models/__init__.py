"""Scene data model: materials, lights, geometry objects, Scene assembly.

The reference couples the scene graph and all integrators in one Scene
class (Scene.hpp:24-27). Here the scene is a host-side assembly object
that flattens into SoA pytrees of device arrays (SURVEY.md section 7.1);
integrators live in ops/ and consume those arrays.
"""

from software_rasterizer_tpu.models.material import Material, MaterialType  # noqa: F401
from software_rasterizer_tpu.models.lights import AreaLight, PointLight  # noqa: F401
from software_rasterizer_tpu.models.objects import (  # noqa: F401
    CubeObject,
    MeshObject,
    SphereLight,
    SphereObject,
)
from software_rasterizer_tpu.models.scene import Scene  # noqa: F401
