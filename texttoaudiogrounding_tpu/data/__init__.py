from texttoaudiogrounding_tpu.data.vocabulary import Vocabulary, build_vocab
from texttoaudiogrounding_tpu.data.tokenizer import (
    DictTokenizer,
    HuggingFaceTokenizer,
)
from texttoaudiogrounding_tpu.data.collate import (
    TextCollate,
    VarLenPadCollate,
    VarNumTextCollate,
    pad_sequence,
)
from texttoaudiogrounding_tpu.data.datasets import (
    AudioCaptionDataset,
    AudioCaptionPhraseIndicesDataset,
    AudioCaptionPhrasesDataset,
    AudioCaptionPhrasesEvalDataset,
    AudioPhraseDataset,
    AudioPhraseEvalDataset,
    AudioSamplePhrasesDataset,
    SamplePhrasesCountDataset,
    SinglePhraseEvalDataset,
)
from texttoaudiogrounding_tpu.data.loader import DataLoader
import texttoaudiogrounding_tpu.data.class_mapping  # noqa: F401 (registry)

__all__ = [
    "Vocabulary", "build_vocab", "DictTokenizer", "HuggingFaceTokenizer",
    "TextCollate", "VarLenPadCollate", "VarNumTextCollate", "pad_sequence",
    "AudioPhraseEvalDataset", "AudioPhraseDataset",
    "AudioSamplePhrasesDataset", "SamplePhrasesCountDataset",
    "AudioCaptionPhrasesDataset", "AudioCaptionPhrasesEvalDataset",
    "SinglePhraseEvalDataset", "AudioCaptionDataset",
    "AudioCaptionPhraseIndicesDataset", "DataLoader",
]
