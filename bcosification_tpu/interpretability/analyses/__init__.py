from bcosification_tpu.interpretability.analyses import (
    localisation,
    localisation_configs,
    text_localisation,
    utils,
)
