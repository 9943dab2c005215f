package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.gen.ChurnDataGen

/** ScalaCheck properties over the pure (non-Spark) kernels: generator
  * determinism and domain invariants, JSON wire-shape validity. */
object GenProperties extends Properties("graft.gen") {

  property("generator is deterministic per (ticks, seed)") =
    forAll(Gen.choose(1, 200), Gen.choose(0L, 10000L)) { (ticks, seed) =>
      val a = ChurnDataGen.generate(ticks, seed)
      val b = ChurnDataGen.generate(ticks, seed)
      a.profiles == b.profiles && a.transactions == b.transactions &&
        a.usage == b.usage && a.tickets == b.tickets
    }

  property("different seeds diverge") =
    forAll(Gen.choose(50, 150)) { ticks =>
      ChurnDataGen.generate(ticks, 1L).transactions !=
        ChurnDataGen.generate(ticks, 2L).transactions
    }

  property("ids match the producer format CUST%05d when present") =
    forAll(Gen.choose(1, 150)) { ticks =>
      ChurnDataGen.generate(ticks).profiles.forall(p =>
        p.customer_id == null || p.customer_id.matches("CUST\\d{5}"))
    }

  property("every tick emits at least one of each core entity") =
    forAll(Gen.choose(1, 100)) { ticks =>
      val b = ChurnDataGen.generate(ticks)
      b.profiles.size >= ticks && b.usage.size >= ticks &&
        b.transactions.size >= ticks
    }

  property("profileJson is parseable JSON with the declared fields") =
    forAll(Gen.choose(1, 100)) { ticks =>
      val b = ChurnDataGen.generate(ticks)
      b.profiles.forall { p =>
        val j = ChurnDataGen.profileJson(p)
        j.startsWith("{") && j.endsWith("}") &&
          j.contains("\"customer_id\":") && j.contains("\"age\":" + p.age)
      }
    }

  property("transaction values are 2-dp money or the injected dirty case") =
    forAll(Gen.choose(1, 200)) { ticks =>
      ChurnDataGen.generate(ticks).transactions.forall { t =>
        val cents = t.value * 100
        math.abs(cents - math.rint(cents)) < 1e-9
      }
    }
}
