from sonicscribe_tpu.stream.buffer import AudioChunk, ChunkBuffer, SpeechSegment  # noqa: F401
