from tinyfaces_tpu.clustering.cluster import (  # noqa: F401
    centralize_bbox,
    compute_distances,
    compute_kmedoids,
    k_medoids,
)
