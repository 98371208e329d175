from .folders import generate_folders  # noqa: F401
from .predict import NeuralBarkCalculator  # noqa: F401
from .preprocess import ProcessedImage, Preprocessor  # noqa: F401
from .report import PredictReporter  # noqa: F401
from .serving import BatchingPredictor, ServeResult  # noqa: F401
