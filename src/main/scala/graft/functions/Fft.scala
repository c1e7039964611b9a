package graft.functions

/** Pure-JVM iterative radix-2 FFT (decimation-in-time, bit-reversal
  * permutation then log2(n) butterfly stages) — the spectral kernel behind
  * the audio fingerprints in [[graft.queries.Multimodal]]. No external DSP
  * dependency: the container has no codec/DSP libs, and a 2^k-point
  * transform is ~40 lines of standard numerics (Cooley–Tukey 1965).
  *
  * Executors call this per frame inside `mapPartitions` — it allocates
  * nothing (in-place on caller arrays) and touches no shared state, so it
  * scales embarrassingly with partitions.
  */
object Fft {

  /** In-place FFT of the complex signal (re, im). Length must be a power of
    * two. Forward transform, no normalization: X_k = Σ_i x_i·e^(-2πi·ki/n).
    */
  def transform(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && (n & (n - 1)) == 0 && n > 0,
      s"radix-2 FFT needs a power-of-two length, got $n")
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // butterfly stages
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val a = base + k
          val b = a + len / 2
          val vr = re(b) * cr - im(b) * ci
          val vi = re(b) * ci + im(b) * cr
          re(b) = re(a) - vr; im(b) = im(a) - vi
          re(a) = re(a) + vr; im(a) = im(a) + vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** |X_k|^2 for k = 0..n/2 of a real signal (zero-padded to `n` if
    * shorter): the one-sided power spectrum the fingerprints peak over.
    */
  def powerSpectrum(samples: Array[Double], n: Int): Array[Double] = {
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    System.arraycopy(samples, 0, re, 0, math.min(samples.length, n))
    transform(re, im)
    Array.tabulate(n / 2 + 1)(k => re(k) * re(k) + im(k) * im(k))
  }
}
