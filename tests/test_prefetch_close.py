"""Prefetcher lifecycle: close() stops a blocked producer and is idempotent."""

import itertools
import threading
import time

from arcflow_tpu.data.prefetch import Prefetcher


def test_close_unblocks_full_queue_producer():
    produced = []

    def gen():
        for i in itertools.count():
            produced.append(i)
            yield i

    p = Prefetcher(gen(), depth=2)
    assert next(p) == 0
    time.sleep(0.3)                   # producer fills the queue and blocks
    n_before = threading.active_count()
    p.close()
    assert not p._thread.is_alive(), 'worker must terminate on close()'
    assert threading.active_count() <= n_before
    p.close()                          # idempotent
    # after close the consumer sees a clean stop
    try:
        next(p)
    except StopIteration:
        pass
    else:
        raise AssertionError('expected StopIteration after close')


def test_finite_iterator_drains_normally():
    p = Prefetcher(iter([1, 2, 3]), depth=2)
    assert list(p) == [1, 2, 3]
    p.close()
