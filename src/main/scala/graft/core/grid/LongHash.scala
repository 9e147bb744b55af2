package graft.core.grid

/** Primitive open-addressing hash structures for packed (row,col) long keys.
  *
  * The detection kernel random-accesses cells millions of times per
  * partition (border scans, gap checks, flood fill); boxed
  * java.lang.Long keys made the kernel GC-bound and capped thread scaling
  * at ~1.7× from 8→32 cores. Keys are always >= 0 (row,col >= 0), so -1 is
  * a free empty sentinel. Linear probing, power-of-two capacity, no
  * deletion (the kernel never removes).
  */
object LongHash {
  final val Empty = -1L

  @inline def mix(k: Long): Int = {
    var z = k * -7046029254386353131L
    z ^= (z >>> 32)
    z.toInt
  }
}

final class LongHashSet(initialCapacity: Int = 16) extends Serializable {
  import LongHash._
  private var cap = Integer.highestOneBit(math.max(16, initialCapacity * 2) - 1) << 1
  private var keys = {
    val a = new Array[Long](cap)
    java.util.Arrays.fill(a, Empty)
    a
  }
  private var _size = 0

  def size: Int = _size
  def isEmpty: Boolean = _size == 0
  def nonEmpty: Boolean = _size > 0

  def contains(k: Long): Boolean = {
    if (k < 0) return false
    val mask = cap - 1
    var i = mix(k) & mask
    while (true) {
      val cur = keys(i)
      if (cur == Empty) return false
      if (cur == k) return true
      i = (i + 1) & mask
    }
    false
  }

  def add(k: Long): Boolean = {
    require(k >= 0, "negative key")
    if (_size * 2 >= cap) grow()
    val mask = cap - 1
    var i = mix(k) & mask
    while (true) {
      val cur = keys(i)
      if (cur == Empty) {
        keys(i) = k
        _size += 1
        return true
      }
      if (cur == k) return false
      i = (i + 1) & mask
    }
    false
  }

  def addAll(other: LongHashSet): Unit = other.foreach(add(_))

  def foreach(f: Long => Unit): Unit = {
    var i = 0
    while (i < cap) {
      val k = keys(i)
      if (k != Empty) f(k)
      i += 1
    }
  }

  def subsetOf(other: LongHashSet): Boolean = {
    var i = 0
    while (i < cap) {
      val k = keys(i)
      if (k != Empty && !other.contains(k)) return false
      i += 1
    }
    true
  }

  def copy(): LongHashSet = {
    val c = new LongHashSet(1)
    c.cap = cap
    c.keys = keys.clone()
    c._size = _size
    c
  }

  def toArraySorted: Array[Long] = {
    val out = new Array[Long](_size)
    var i = 0
    var j = 0
    while (i < cap) {
      val k = keys(i)
      if (k != Empty) { out(j) = k; j += 1 }
      i += 1
    }
    java.util.Arrays.sort(out)
    out
  }

  private def grow(): Unit = {
    val old = keys
    cap = cap << 1
    keys = new Array[Long](cap)
    java.util.Arrays.fill(keys, Empty)
    _size = 0
    var i = 0
    while (i < old.length) {
      val k = old(i)
      if (k != Empty) add(k)
      i += 1
    }
  }
}

final class LongObjMap[V >: Null <: AnyRef](initialCapacity: Int = 16) extends Serializable {
  import LongHash._
  private var cap = Integer.highestOneBit(math.max(16, initialCapacity * 2) - 1) << 1
  private var keys = new Array[Long](cap)
  private var vals = new Array[AnyRef](cap) // null == empty slot
  private var _size = 0

  def size: Int = _size
  def isEmpty: Boolean = _size == 0

  def get(k: Long): V = {
    if (k < 0) return null
    val mask = cap - 1
    var i = mix(k) & mask
    while (true) {
      val v = vals(i)
      if (v == null) return null
      if (keys(i) == k) return v.asInstanceOf[V]
      i = (i + 1) & mask
    }
    null
  }

  def put(k: Long, v: V): Unit = {
    require(k >= 0 && v != null, "negative key or null value")
    if (_size * 2 >= cap) grow()
    val mask = cap - 1
    var i = mix(k) & mask
    while (true) {
      val cur = vals(i)
      if (cur == null) {
        keys(i) = k
        vals(i) = v
        _size += 1
        return
      }
      if (keys(i) == k) {
        vals(i) = v
        return
      }
      i = (i + 1) & mask
    }
  }

  def foreachValue(f: V => Unit): Unit = {
    var i = 0
    while (i < cap) {
      val v = vals(i)
      if (v != null) f(v.asInstanceOf[V])
      i += 1
    }
  }

  def foreachKey(f: Long => Unit): Unit = {
    var i = 0
    while (i < cap) {
      if (vals(i) != null) f(keys(i))
      i += 1
    }
  }

  private def grow(): Unit = {
    val oldK = keys
    val oldV = vals
    cap = cap << 1
    keys = new Array[Long](cap)
    vals = new Array[AnyRef](cap)
    _size = 0
    var i = 0
    while (i < oldK.length) {
      if (oldV(i) != null) put(oldK(i), oldV(i).asInstanceOf[V])
      i += 1
    }
  }
}
