from loner_tpu.models.field import FieldConfig, init_field_params, query_field, query_sigma
from loner_tpu.models.hash_encoding import HashEncodingConfig, hash_encode
from loner_tpu.models.losses import get_logits_grad, get_weights_gt, js_divergence_gaussian
from loner_tpu.models.occupancy_grid import init_occ_grid, interpolate_occ_logits, occ_grid_update
from loner_tpu.models.rendering import (
    OccGridRaySampler,
    UniformRaySampler,
    pack_rays,
    raw2outputs,
    render_rays,
    sample_pdf,
)

__all__ = [
    "FieldConfig", "init_field_params", "query_field", "query_sigma",
    "HashEncodingConfig", "hash_encode", "get_logits_grad", "get_weights_gt",
    "js_divergence_gaussian", "init_occ_grid", "interpolate_occ_logits",
    "occ_grid_update", "OccGridRaySampler", "UniformRaySampler", "pack_rays",
    "raw2outputs", "render_rays", "sample_pdf",
]
