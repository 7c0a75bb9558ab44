"""Asset I/O (reference: solr/io/ — OBJReader, PDBReader, SWCReader,
FileMarshaller — and solr/images/ImageLoader)."""

from solr_tpu.io.obj import load_obj
from solr_tpu.io.pdb import load_pdb
from solr_tpu.io.swc import load_swc
from solr_tpu.io.irt import save_scene, load_scene
from solr_tpu.io.image import load_image

__all__ = [
    "load_obj",
    "load_pdb",
    "load_swc",
    "save_scene",
    "load_scene",
    "load_image",
]
