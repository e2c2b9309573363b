from .stt import SttClient, SttEvent
from .tts import TtsClient
