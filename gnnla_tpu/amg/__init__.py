from gnnla_tpu.amg.splitting import (
    split, split_cljp, split_pmis, split_alternating)
from gnnla_tpu.amg.interp import assemble_prolongation
from gnnla_tpu.amg.galerkin import galerkin_product

__all__ = ["split", "split_cljp", "split_pmis", "split_alternating",
           "assemble_prolongation", "galerkin_product"]
