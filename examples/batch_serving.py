"""Concurrent synthesis through the micro-batcher: many requests share
padded device batches transparently."""

import threading

from vietvoice_tts_tpu import ModelConfig, TTSApi

api = TTSApi(ModelConfig(max_batch_size=8))
api.engine.enable_micro_batching(max_wait_ms=10)

texts = [f"Đây là yêu cầu số {i} trong lô." for i in range(16)]
results = {}


def worker(i: int) -> None:
    wave, t = api.synthesize(texts[i])
    results[i] = (len(wave) / 24000.0, t)


threads = [threading.Thread(target=worker, args=(i,)) for i in range(len(texts))]
for t in threads:
    t.start()
for t in threads:
    t.join()

stats = api.engine.batcher.stats
print(f"{len(results)} utterances, mean device batch {stats.mean_batch_size:.1f}")
for i, (dur, t) in sorted(results.items()):
    print(f"  #{i}: {dur:.2f}s audio in {t:.2f}s")
