from .mesh_io import MeshData, read_mesh, read_ply, read_obj, write_obj, \
    write_ply
from .template import (Template, load_template, template_from_mesh,
                       COLOUR2ATTRIBUTE, PROCEDURES2ATTRIBUTES)
from .simplify import SparseCOO, simplify_mesh, upsampling_transform, \
    simplification_hierarchy
from .spirals import extract_spirals, preprocess_spiral
from .halfedge import HalfedgeMesh
from .precompute import (GeometryBundle, precompute_geometry,
                         load_or_compute_geometry,
                         import_reference_transforms,
                         import_reference_spirals)
