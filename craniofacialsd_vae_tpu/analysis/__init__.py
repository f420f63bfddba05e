from .classifiers import (QDAClassifier, LDAClassifier, LinearSVM,
                          MLPTrainer, LatentClassifiers)
