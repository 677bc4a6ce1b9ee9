from .batched import forward_batched
from .similarity import (SimilarityIndex, cosine_scores, cosine_topk,
                         normalize_rows, pixel_cosine_topk, topk_recall)
from .kmeans import (assign_euclidean, assign_min_cosine, cluster_members,
                     kmeans)
from .pipeline import (anomaly_scores, anomaly_threshold, detect_anomalies,
                       fix_images, generate_and_invert, variation_sweep)
from .e2e import (chunked_topk_search, make_distributed_e2e_program,
                  make_e2e_program, make_serial_programs, topk_all)
from .refine import make_refiner
from .distributed import (distributed_cosine_topk,
                          distributed_generate_and_invert)
