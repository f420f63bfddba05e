from .classifiers import (QDAClassifier, LDAClassifier, LinearSVM,
                          MLPTrainer, LatentClassifiers)
from .tester import (Tester, compute_latent_stats, reconstruction_errors,
                     random_generation, vector_linspace)
